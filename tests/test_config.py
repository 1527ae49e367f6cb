"""Config loader: our yaml tree AND the reference's yaml files must parse."""
import os

import pytest

from echoscene_tpu.models.config import load_config, EchoSceneConfig

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_load_own_flagship():
    cfg = load_config(os.path.join(REPO, "configs", "full_mp.yaml"))
    assert cfg.layout_denoiser.model_channels == 512
    assert cfg.layout_denoiser.conditioning_key == "crossattn"
    assert cfg.layout_denoiser.crossattn_dim == 1280
    assert cfg.layout_diffusion.time_num == 1000
    assert cfg.layout_diffusion.beta_start == 1e-4
    assert cfg.shape_branch.denoiser.model_channels == 224
    assert cfg.shape_branch.denoiser.channel_mult == (1, 2, 3)
    assert cfg.shape_branch.denoiser.message_passing is True
    assert cfg.shape_branch.denoiser.linear_start == 0.00085
    assert cfg.shape_branch.vqvae.n_embed == 8192
    assert cfg.shape_branch.vqvae.ch_mult == (1, 2, 4)
    assert cfg.diffusion_bs == 64
    assert cfg.lr_step == (35000, 70000, 140000)


def test_load_concat_variant():
    cfg = load_config(os.path.join(REPO, "configs", "full_concat_mp.yaml"))
    assert cfg.layout_denoiser.conditioning_key == "concat"
    assert cfg.shape_branch.denoiser.conditioning_key == "concat"


def test_load_box_variant():
    cfg = load_config(os.path.join(REPO, "configs", "box_mp.yaml"),
                      network_type="echolayout")
    assert cfg.network_type == "echolayout"
    assert cfg.layout_diffusion.loss_iou is True
    assert cfg.layout_diffusion.iou_type == "aabb"


@pytest.mark.skipif(not os.path.exists("/root/reference/config/full_mp.yaml"),
                    reason="reference tree not mounted")
def test_load_reference_yaml_directly():
    """The loader must consume the reference's own config files."""
    cfg = load_config("/root/reference/config/full_mp.yaml")
    assert cfg.layout_denoiser.model_channels == 512
    assert cfg.shape_branch.denoiser.model_channels == 224
    assert cfg.shape_branch.denoiser.message_passing is True
    assert cfg.shape_branch.vqvae.n_embed == 8192


def test_bf16_training_keeps_inference_twin():
    """compute_dtype=bfloat16 (validated mixed-precision training, BASELINE.md
    round-4 A/B) must NOT collapse the inference twin into the train module:
    the twin carries sampling-only structure (no remat, factored upsample)
    independent of the training dtype."""
    from echoscene_tpu.models.config import tiny_config
    from echoscene_tpu.models.sgdiff import SGDiff

    cfg = tiny_config()
    cfg.compute_dtype = "bfloat16"
    assert cfg.sample_dtype == "bfloat16"
    sg = SGDiff(cfg, num_objs=8, num_preds=4)
    assert sg.module_infer is not sg.module
    icfg = sg.module_infer.cfg
    assert icfg.compute_dtype == "bfloat16"
    assert icfg.shape_branch.denoiser.use_checkpoint is False
    assert icfg.shape_branch.denoiser.factored_upsample is True
    # train module keeps its own structure
    assert sg.module.cfg.shape_branch.vqvae.factored_upsample is False


def test_compute_dtype_default_is_unified():
    """ONE owner for the training-precision decision (VERDICT r4 weak #5):
    the EchoSceneConfig default is bfloat16, train.cli defaults to it
    (--compute_dtype None = keep config), and bench.py times the config
    default — so BENCH_r{N} guards the out-of-the-box trainer."""
    from echoscene_tpu.models.config import EchoSceneConfig
    assert EchoSceneConfig().compute_dtype == "bfloat16"

    from echoscene_tpu.train.cli import build_parser
    args = build_parser().parse_args(
        ["--dataset", "x", "--exp", "y", "--diff_yaml", "z"])
    assert args.compute_dtype is None     # None = config default

    import ast, os
    bench_src = open(os.path.join(os.path.dirname(__file__), "..",
                                  "bench.py")).read()
    assert 'compute_dtype=' not in bench_src.split("build_flagship(")[1] \
        .split(")")[0], "bench.py must not override the config default"
