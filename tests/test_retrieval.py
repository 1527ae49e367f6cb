"""3D-FUTURE retrieval render mode: size lookup, OBJ IO, placement, render.

Reference semantics: helpers/util.py:71-138 (nearest-size retrieval +
yaw/translate placement) and eval_3dfront.py --render_type retrieval|onlybox.
"""
import json
import os

import numpy as np
import pytest

from echoscene_tpu.eval.retrieval import (SizeDatabase, assemble_scene_retrieval,
                                          place_retrieved, read_obj,
                                          render_scene_retrieval)
from echoscene_tpu.eval.render import export_obj


def _cube(sx, sy, sz):
    v = np.array([[x, y, z] for x in (0, sx) for y in (0, sy)
                  for z in (0, sz)], np.float32)
    f = np.array([[0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
                  [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3],
                  [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6]], np.int32)
    return v, f


@pytest.fixture(scope="module")
def fake_db(tmp_path_factory):
    root = tmp_path_factory.mktemp("future")
    model_dir = root / "3D-FUTURE-model"
    table = {"bed": {}, "table": {}}
    sizes = {"bed": [(2.0, 0.5, 1.6), (1.2, 0.4, 1.0)],
             "table": [(0.8, 0.7, 0.8)]}
    for cat, szs in sizes.items():
        for k, s in enumerate(szs):
            jid = f"{cat}-{k}"
            table[cat][jid] = list(s)
            d = model_dir / jid
            d.mkdir(parents=True)
            v, f = _cube(*s)
            export_obj(str(d / "raw_model.obj"), v, f)
    p = root / "cat_jid_trainval.json"
    with open(p, "w") as f:
        json.dump(table, f)
    return SizeDatabase(str(p)), table


def test_nearest_size_lookup(fake_db):
    db, table = fake_db
    assert db.closest("bed", [1.9, 0.5, 1.5]) == "bed-0"
    assert db.closest("bed", [1.1, 0.35, 1.0]) == "bed-1"
    assert db.closest("table", [9, 9, 9]) == "table-0"
    assert db.closest("no_such_cat", [1, 1, 1]) is None


def test_read_obj_roundtrip(fake_db, tmp_path):
    v, f = _cube(1.0, 2.0, 3.0)
    p = str(tmp_path / "m.obj")
    export_obj(p, v, f)
    v2, f2 = read_obj(p)
    np.testing.assert_allclose(v2, v, atol=1e-6)
    np.testing.assert_array_equal(f2, f)


def test_read_obj_triangulates_quads(tmp_path):
    p = str(tmp_path / "quad.obj")
    with open(p, "w") as f:
        f.write("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf 1/1 2/2 3/3 4/4\n")
    v, faces = read_obj(p)
    assert v.shape == (4, 3)
    np.testing.assert_array_equal(faces, [[0, 1, 2], [0, 2, 3]])


def test_place_retrieved_rotates_and_translates(fake_db):
    v = np.array([[1.0, 0.0, 0.0]], np.float32)
    # yaw pi/2 about +y, then translate
    out = place_retrieved(v, [1, 1, 1, 10.0, 0.0, 5.0, np.pi / 2])
    # R(pi/2) = [[0,0,-1],[0,1,0],[1,0,0]]; v @ R = (0, 0, -1)
    np.testing.assert_allclose(out[0], [10.0, 0.0, 4.0], atol=1e-5)


def test_assemble_and_render_retrieval(fake_db, tmp_path):
    db, _ = fake_db
    classes = ["_scene_", "bed", "table", "floor", "unknown_cat"]
    objs = [1, 2, 0, 3, 4]
    boxes7 = np.array([
        [2.0, 0.5, 1.6, 0, 0, 0, 0.0],
        [0.8, 0.7, 0.8, 1.5, 0, 1.5, 0.3],
        [1, 1, 1, 0, 0, 0, 0],            # _scene_: skipped
        [4, 0.1, 4, 0, 0, 0, 0],          # floor: skipped
        [1, 1, 1, -1, 0, -1, 0],          # unknown: box fallback
    ], np.float32)
    mesh_dir = str(tmp_path / "meshes")
    verts, tris, colors = assemble_scene_retrieval(
        objs, boxes7, classes, db, mesh_dir=mesh_dir)
    assert len(verts) and len(tris) == len(colors)
    # floor plane (2) + two retrieved cubes (12 each) + fallback box (12)
    assert len(tris) == 2 + 12 + 12 + 12
    exported = os.listdir(mesh_dir)
    assert any(e.startswith("bed_") for e in exported)
    assert any(e.startswith("table_") for e in exported)

    img = render_scene_retrieval(objs, boxes7, classes, db)
    assert img.shape == (256, 256, 3) and img.dtype == np.uint8
    assert (img != 255).any()   # something was drawn


# ---------------------------------------------------------------------------
# txt2shape mode (get_sdfusion_models, helpers/util.py:334-374)

@pytest.fixture(scope="module")
def fake_results_dir(tmp_path_factory):
    from echoscene_tpu.eval.render import export_ply
    root = tmp_path_factory.mktemp("txt2shape_results")
    for cat, n in [("bed", 2), ("table", 1)]:
        d = root / cat
        d.mkdir()
        for k in range(n):
            v, f = _cube(1.0 + k, 1.0, 1.0)
            export_ply(str(d / f"res{k}.ply"), v, f)
    return str(root)


def test_mesh_results_dir_pick(fake_results_dir):
    from echoscene_tpu.eval.retrieval import MeshResultsDir
    db = MeshResultsDir(fake_results_dir)
    assert db.files("bed") == ["res0.ply", "res1.ply"]
    assert db.pick("no_such_cat", 0) is None
    v0, f0 = db.pick("bed", 0)
    v2, _ = db.pick("bed", 2)           # deterministic: index % len
    np.testing.assert_allclose(v0, v2)
    assert f0.shape == (12, 3)


def test_assemble_and_render_txt2shape(fake_results_dir, tmp_path):
    from echoscene_tpu.eval.retrieval import (MeshResultsDir,
                                              assemble_scene_txt2shape,
                                              render_scene_txt2shape)
    db = MeshResultsDir(fake_results_dir)
    classes = ["_scene_", "bed", "table", "floor", "unknown_cat"]
    objs = [1, 2, 0, 3, 4]
    boxes7 = np.array([
        [2.0, 0.5, 1.6, 0, 0, 0, 0.0],
        [0.8, 0.7, 0.8, 1.5, 0, 1.5, 0.3],
        [1, 1, 1, 0, 0, 0, 0],            # _scene_: skipped
        [4, 0.1, 4, 0, 0, 0, 0],          # floor: skipped
        [1, 1, 1, -1, 0, -1, 0],          # no results: box fallback
    ], np.float32)
    mesh_dir = str(tmp_path / "meshes")
    verts, tris, colors = assemble_scene_txt2shape(
        objs, boxes7, classes, db, mesh_dir=mesh_dir)
    assert len(tris) == 2 + 12 + 12 + 12 and len(tris) == len(colors)
    exported = sorted(os.listdir(mesh_dir))
    assert any(e.startswith("bed_") for e in exported)
    assert any(e.startswith("table_") for e in exported)

    # the fitted bed mesh must match the predicted box extents (the mode
    # SCALES results into the box, unlike retrieval placement)
    bed_v = verts[4:12]                   # floor quad (4 verts) comes first
    ext = bed_v.max(0) - bed_v.min(0)
    # box7 = [l, h, w, ...] with l along x after the -pi/2 canonical yaw:
    # fit_verts_to_box scales per-axis to (l, h, w)
    np.testing.assert_allclose(sorted(ext), sorted([2.0, 0.5, 1.6]), atol=1e-4)

    img = render_scene_txt2shape(objs, boxes7, classes, db)
    assert img.shape == (256, 256, 3) and img.dtype == np.uint8
    assert (img != 255).any()


def test_txt2shape_exports_raw_prefit_and_lamps(fake_results_dir, tmp_path):
    """Export parity with get_sdfusion_models (helpers/util.py:363-367): the
    exported OBJ is the RAW pre-fit mesh, and lamps are exported (advancing
    the instance counter) before without_lamp drops them from the render."""
    from echoscene_tpu.eval.render import export_ply
    from echoscene_tpu.eval.retrieval import (MeshResultsDir,
                                              assemble_scene_txt2shape)
    from echoscene_tpu.eval.retrieval import read_obj

    # add a lamp category to the results db
    lv, lf = _cube(0.4, 1.2, 0.4)
    d = os.path.join(fake_results_dir, "lamp")
    os.makedirs(d, exist_ok=True)
    export_ply(os.path.join(d, "res0.ply"), lv, lf)

    classes = ["bed", "lamp", "table"]
    objs = [0, 1, 2]
    boxes7 = np.array([
        [2.0, 0.5, 1.6, 0, 0, 0, 0.0],
        [0.5, 1.5, 0.5, 2, 0, 2, 0.0],
        [0.8, 0.7, 0.8, 1.5, 0, 1.5, 0.3],
    ], np.float32)
    mesh_dir = str(tmp_path / "m")
    verts, tris, colors = assemble_scene_txt2shape(
        objs, boxes7, classes, db=MeshResultsDir(fake_results_dir),
        mesh_dir=mesh_dir, without_lamp=True)
    exported = sorted(os.listdir(mesh_dir))
    # lamp exported with instance 2; table still numbered AFTER it (3)
    assert exported == ["bed_0_1.obj", "lamp_1_2.obj", "table_2_3.obj"]
    # exported bed is the RAW result mesh (extent 1x1x1 cube), NOT fitted
    # to the 2.0 x 0.5 x 1.6 box
    bv, _ = read_obj(os.path.join(mesh_dir, "bed_0_1.obj"))
    np.testing.assert_allclose(bv.max(0) - bv.min(0), [1.0, 1.0, 1.0],
                               atol=1e-5)
    # lamp dropped from the RENDER only: floor quad + bed cube + table cube
    assert len(tris) == 2 + 12 + 12


def test_mesh_results_dir_validates_root(tmp_path):
    from echoscene_tpu.eval.retrieval import MeshResultsDir
    with pytest.raises(FileNotFoundError):
        MeshResultsDir(str(tmp_path / "nope"))
    empty = tmp_path / "empty"
    empty.mkdir()
    with pytest.warns(UserWarning, match="no .*ply"):
        MeshResultsDir(str(empty))
