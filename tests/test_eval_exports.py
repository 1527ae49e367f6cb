"""Eval-time artifact export parity (VERDICT r2 missing-#2/#3):
  * --export_3d JSON dump of generated boxes (the reference parses the flag
    but never implements it, eval_3dfront.py:34),
  * .glb scene export (render_full :313),
  * manipulation-overlay render (changed nodes tinted,
    helpers/visualize_scene.py:156-239),
  * eval CLI --room_type / --export_3d / --export_glb flags exist.

Uses the score_scene path directly (no model jit — fast).
"""
import json
import os

import numpy as np
import pytest

from echoscene_tpu.eval.evaluator import SceneEvaluator
from echoscene_tpu.eval.metrics import new_accuracy_dict

STATS = np.asarray([0, 0, 0, 1, 1, 1, 0, 0, 0, 1, 1, 1, 0, 1], np.float32)


class _DS:
    vocab = {"object_idx_to_name": ["_scene_\n", "bed\n", "chair\n"],
             "pred_idx_to_name": ["in\n", "left\n"]}


class _Ex:
    scan_id = "exp_test"
    num_nodes = 3
    instance_ids = [1, 2]
    objs = np.asarray([1, 2, 0])
    triples = np.asarray([[0, 1, 1]], np.int64)
    boxes = np.asarray([[0.5, 0.5, 0.5, 0.1, 0.0, 0.1, 0.0],
                        [0.4, 0.4, 0.4, -0.5, 0.0, -0.5, 0.0],
                        [-1, -1, -1, -1, -1, -1, -1]], np.float32)


def _make_ev(tmp_path, **over):
    ev = SceneEvaluator.__new__(SceneEvaluator)
    ev.gen_shape = False
    ev.dump_sdfs = False
    ev.render_dir = None
    ev.bin_angle = False
    ev.export_3d = False
    ev.export_glb = False
    ev.render_type = "onlybox"
    ev.store_path = str(tmp_path)
    ev.stats = STATS
    for k, v in over.items():
        setattr(ev, k, v)
    return ev


def _out(keep):
    return {
        "sizes": np.full((3, 3), 0.2, np.float32),
        "translations": np.zeros((3, 3), np.float32),
        "angles": np.zeros((3, 1), np.float32),
        "keep": np.asarray(keep, np.float32),
    }


def test_export_3d_json(tmp_path):
    ev = _make_ev(tmp_path, export_3d=True)
    ev.score_scene(_DS(), _Ex(), _out([1, 1, 1]), "none",
                   new_accuracy_dict(), new_accuracy_dict())
    p = tmp_path / "export_3d" / "none_exp_test.json"
    rec = json.loads(p.read_text())
    assert rec["scan_id"] == "exp_test"
    assert rec["classes"] == ["bed", "chair", "_scene_"]
    assert np.asarray(rec["boxes_generated"]).shape == (3, 7)
    assert rec["keep"] == [1, 1, 1]
    assert "boxes_scored" not in rec   # only for manipulation eval types


def test_export_3d_manipulation_includes_scored_boxes(tmp_path):
    ev = _make_ev(tmp_path, export_3d=True)
    ev.score_scene(_DS(), _Ex(), _out([0, 1, 1]), "relationship",
                   new_accuracy_dict(), new_accuracy_dict())
    rec = json.loads(
        (tmp_path / "export_3d" / "relationship_exp_test.json").read_text())
    gen = np.asarray(rec["boxes_generated"])
    scored = np.asarray(rec["boxes_scored"])
    # changed node (keep=0) keeps the generated box; kept nodes get GT boxes
    np.testing.assert_allclose(scored[0], gen[0])
    assert not np.allclose(scored[1, :6], gen[1, :6])


def test_glb_export_and_overlay_render(tmp_path):
    rd = str(tmp_path / "renders")
    ev = _make_ev(tmp_path, render_dir=rd, export_glb=True)
    os.makedirs(rd, exist_ok=True)
    ev.score_scene(_DS(), _Ex(), _out([0, 1, 1]), "relationship",
                   new_accuracy_dict(), new_accuracy_dict())
    assert os.path.isfile(os.path.join(rd, "exp_test.png"))
    assert os.path.isfile(os.path.join(rd, "exp_test_mani.png"))
    glb = os.path.join(rd, "exp_test_onlybox.glb")
    assert os.path.isfile(glb)

    from echoscene_tpu.eval.render import read_glb
    pos, col = read_glb(glb)
    assert pos.shape == col.shape and pos.shape[1] == 3
    assert len(pos) % 3 == 0 and len(pos) > 0

    # the overlay tints the changed object: renders must differ
    from PIL import Image
    a = np.asarray(Image.open(os.path.join(rd, "exp_test.png")))
    b = np.asarray(Image.open(os.path.join(rd, "exp_test_mani.png")))
    assert a.shape == b.shape and (a != b).any()


def test_glb_roundtrip_geometry(tmp_path):
    from echoscene_tpu.eval.render import export_glb, read_glb
    verts = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]],
                       np.float32)
    tris = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)
    colors = np.asarray([[1, 0, 0], [0, 1, 0]], np.float32)
    p = str(tmp_path / "t.glb")
    export_glb(p, verts, tris, colors)
    pos, col = read_glb(p)
    np.testing.assert_allclose(pos, verts[tris.reshape(-1)])
    np.testing.assert_allclose(col[:3], np.tile([[1, 0, 0]], (3, 1)))
    np.testing.assert_allclose(col[3:], np.tile([[0, 1, 0]], (3, 1)))


def test_glb_empty_scene_writes_nothing(tmp_path):
    """glTF 2.0 requires accessor.count >= 1 — an empty assemble_scene result
    must not produce a spec-violating .glb (strict viewers reject count=0)."""
    from echoscene_tpu.eval.render import export_glb
    p = str(tmp_path / "empty.glb")
    export_glb(p, np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32))
    assert not os.path.exists(p)


def test_assemble_scene_highlight_changes_colors():
    from echoscene_tpu.eval.render import assemble_scene
    objs = [1, 2]
    boxes7 = np.asarray([[1, 1, 1, 0, 0, 0, 0],
                         [1, 1, 1, 2, 0, 2, 0]], np.float32)
    names = ["_scene_", "bed", "chair"]
    _, _, c0 = assemble_scene(objs, boxes7, names)
    _, _, c1 = assemble_scene(objs, boxes7, names, highlight=[1, 0])
    # floor (first 2 tris) identical; first object tinted; second unchanged
    np.testing.assert_allclose(c0[:2], c1[:2])
    assert not np.allclose(c0[2:14], c1[2:14])
    np.testing.assert_allclose(c0[14:], c1[14:])


def test_cli_flags_exist():
    from echoscene_tpu.eval.cli import build_parser
    p = build_parser()
    args = p.parse_args(["--exp", "x", "--export_3d", "--export_glb",
                         "--room_type", "livingroom"])
    assert args.export_3d and args.export_glb
    assert args.room_type == "livingroom"
