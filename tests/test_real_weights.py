"""Real-weights installation contract (VERDICT r3 Next #6).

The hermetic parts (always run): the weights registry's resolution logic and
every 'auto' backend's fallback behavior.  The real-backend smokes are
skipif-absent — they document exactly what starts working the day
`scripts/fetch_weights.py --inception ... --clip ...` is run:

  * eval/fid.get_extractor('auto') -> JAX FID-Inception port, (N, 2048)
    features (reference: scripts/compute_fid_scores_3dfront.py:132-161),
  * data/clip_text.ClipTextEncoder('auto') -> transformers text tower,
    deterministic (512,) phrase embeddings (threedfront_dataset.py:157-163),
  * eval/clip_image.ClipImageEncoder('auto') -> vision tower (512,).
"""
import os

import numpy as np
import pytest

from echoscene_tpu import weights as W


@pytest.fixture
def empty_weights(tmp_path, monkeypatch):
    monkeypatch.setenv("ECHOSCENE_WEIGHTS_DIR", str(tmp_path / "w"))
    return tmp_path / "w"


def test_status_empty(empty_weights):
    st = W.status()
    assert st["inception"] is None and st["clip"] is None
    assert st["weights_dir"] == str(empty_weights)


def test_auto_backends_fall_back_hermetically(empty_weights):
    from echoscene_tpu.data.clip_text import ClipTextEncoder
    from echoscene_tpu.eval.clip_image import ClipImageEncoder
    from echoscene_tpu.eval.fid import get_extractor

    enc = ClipTextEncoder("auto")
    assert enc.backend == "hash"
    v = enc.encode("a bed close by a wardrobe")
    assert v.shape == (512,)
    img = ClipImageEncoder("auto")
    assert img.backend == "pixel"
    ext = get_extractor("auto")  # random-conv proxy, warns
    feats = ext(np.zeros((2, 64, 64, 3), np.uint8))
    assert feats.shape[0] == 2


def test_install_inception_and_resolution(empty_weights, tmp_path):
    src = tmp_path / "pt_inception-2015-12-05.pt"
    src.write_bytes(b"not-a-real-checkpoint")
    dst = W.install_inception(str(src))
    assert os.path.exists(dst)
    assert W.inception_weights() == dst
    # npz takes precedence once installed (conversion cache contract)
    npz = tmp_path / "inception.npz"
    np.savez(npz, dummy=np.zeros(1))
    dst2 = W.install_inception(str(npz))
    assert W.inception_weights() == dst2


def test_install_clip_requires_snapshot_dir(empty_weights, tmp_path):
    with pytest.raises(ValueError):
        W.install_clip(str(tmp_path / "nope"))
    snap = tmp_path / "snap"
    snap.mkdir()
    with pytest.raises(ValueError):
        W.install_clip(str(snap))  # no config.json
    (snap / "config.json").write_text("{}")
    dst = W.install_clip(str(snap))
    assert W.clip_text_dir() == dst


def test_train_cli_records_resolved_backend():
    """args.json must carry the RESOLVED backend ('hash' hermetically, never
    'auto') so eval reproduces the training-time features."""
    from echoscene_tpu.train.cli import build_parser
    assert build_parser().get_default("clip_backend") == "auto"


# --- real-backend smokes: skipped until weights are installed --------------
needs_inception = pytest.mark.skipif(
    W.inception_weights() is None,
    reason="no installed Inception weights (scripts/fetch_weights.py)")
needs_clip = pytest.mark.skipif(
    W.clip_text_dir() is None,
    reason="no installed CLIP weights (scripts/fetch_weights.py)")


@needs_inception
def test_real_inception_features():
    from echoscene_tpu.eval.fid import get_extractor
    imgs = np.random.default_rng(0).integers(
        0, 255, size=(2, 299, 299, 3)).astype(np.uint8)
    feats = get_extractor("auto")(imgs)
    assert feats.shape == (2, 2048)
    assert np.isfinite(feats).all()


@needs_clip
def test_real_clip_text_and_vision():
    from echoscene_tpu.data.clip_text import ClipTextEncoder
    from echoscene_tpu.eval.clip_image import ClipImageEncoder

    enc = ClipTextEncoder("auto")
    assert enc.backend == "transformers"
    a = enc.encode("a bed close by a wardrobe")
    b = enc.encode("a bed close by a wardrobe")
    np.testing.assert_array_equal(a, b)
    assert a.shape == (512,) and np.isfinite(a).all()

    img_enc = ClipImageEncoder("auto")
    f = img_enc.encode(np.zeros((64, 64, 3), np.uint8))
    assert f.shape == (512,) and np.isfinite(f).all()
