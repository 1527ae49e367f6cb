"""Regression: SDF dumps must be float32 regardless of the sampling dtype.

np.savez stores ml_dtypes.bfloat16 arrays as raw void ('|V2'), which the
downstream metric CLIs (consistency_check, mesh export) cannot read.
"""
import numpy as np
import jax.numpy as jnp


class _Ex:
    scan_id = "dump_test"
    num_nodes = 3
    instance_ids = [1, 2]
    objs = np.asarray([1, 2, 0])
    triples = np.zeros((1, 3), np.int64)
    boxes = np.zeros((3, 7), np.float32)


def test_dumped_sdfs_are_float32(tmp_path):
    from echoscene_tpu.eval.evaluator import SceneEvaluator

    ev = SceneEvaluator.__new__(SceneEvaluator)   # dump path only
    ev.gen_shape = True
    ev.dump_sdfs = True
    ev.render_dir = None
    ev.bin_angle = False
    ev.export_3d = False
    ev.export_glb = False
    ev.store_path = str(tmp_path)
    ev.stats = np.asarray([0, 0, 0, 1, 1, 1, 0, 0, 0, 1, 1, 1, 0, 1],
                          np.float32)

    class _DS:
        vocab = {"object_idx_to_name": ["_scene_\n", "bed\n", "chair\n"],
                 "pred_idx_to_name": ["in\n"]}

    out = {
        "sizes": np.zeros((3, 3), np.float32),
        "translations": np.zeros((3, 3), np.float32),
        "angles": np.zeros((3, 1), np.float32),
        "keep": np.zeros(3, np.float32),
        "shapes": jnp.zeros((3, 8, 8, 8, 1), jnp.bfloat16),  # bf16 sampling
    }
    from echoscene_tpu.eval.metrics import new_accuracy_dict
    ev.score_scene(_DS(), _Ex(), out, "none", new_accuracy_dict(),
                   new_accuracy_dict())
    d = np.load(tmp_path / "dump_test.npz", allow_pickle=True)
    assert d["sdfs"].dtype == np.float32, d["sdfs"].dtype
    assert d["sdfs"].shape == (3, 8, 8, 8)
