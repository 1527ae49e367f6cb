"""Real-data readiness gate (scripts/check_sgfront.py / data/check.py):
green on the fake fixture, actionable errors on a corrupted copy, and the
CLIP-cache writer produces pickles the reference's loader alignment accepts.
"""
import json
import os
import pickle
import shutil

import numpy as np
import pytest

from echoscene_tpu.data.check import (check_dataset, clip_pickle_path,
                                      write_clip_cache)
from echoscene_tpu.data.fake import make_fake_dataset


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("sgfront"))
    make_fake_dataset(root, num_scenes=4, min_objs=3, max_objs=5, sdf_res=16,
                      with_sdf=True)
    return root


def test_fixture_passes(fixture_root):
    rep = check_dataset(fixture_root, sdf_res=16)
    assert rep.ok, rep.render()
    assert rep.stats["scans_trainval"] == 4
    assert rep.stats["sdf_files(found/missing)"][1] == 0


def test_corrupted_copy_reports_actionable_errors(fixture_root, tmp_path):
    root = str(tmp_path / "bad")
    shutil.copytree(fixture_root, root)
    # model_path entries are absolute into the original fixture; point the
    # copy at its own tree so corruptions below are what the checker sees
    for suffix in ("trainval", "test"):
        p = os.path.join(root, f"obj_boxes_bedroom_{suffix}.json")
        with open(p) as f:
            txt = f.read()
        with open(p, "w") as f:
            f.write(txt.replace(fixture_root, root))

    # 1. break an SDF grid contract (wrong dataset name)
    import h5py
    sdf_dir = os.path.join(root, "3D-FUTURE-SDF")
    victim = os.path.join(sdf_dir, sorted(os.listdir(sdf_dir))[0],
                          "ori_sample_grid.h5")
    os.remove(victim)
    with h5py.File(victim, "w") as f:
        f.create_dataset("wrong_name", data=np.zeros((2,), np.float32))

    # 2. break a relationship row (endpoint not in objects) + predicate id 0
    rj = os.path.join(root, "relationships_bedroom_trainval.json")
    data = json.load(open(rj))
    data["scans"][0]["relationships"].append([999, 1, 3, "front"])
    data["scans"][1]["relationships"].append([1, 2, 0, "left"])
    # non-numeric predicate id must REPORT, not crash the checker
    data["scans"][2]["relationships"].append([1, 2, "oops", "left"])
    json.dump(data, open(rj, "w"))

    # 3. break a box entry (param7 too short) and drop scene_center
    bj = os.path.join(root, "obj_boxes_bedroom_trainval.json")
    bdata = json.load(open(bj))
    sid0 = data["scans"][0]["scan"]
    bdata[sid0]["1"]["param7"] = [1.0, 2.0]
    del bdata[sid0]["scene_center"]
    json.dump(bdata, open(bj, "w"))

    # 4. break the bounds file
    with open(os.path.join(root, "centered_bounds_bedroom_trainval.txt"),
              "w") as f:
        f.write("1.0 2.0 3.0\n")

    # 5. unmapped class
    mp = os.path.join(root, "mapping.json")
    m = json.load(open(mp))
    del m["lamp"]
    json.dump(m, open(mp, "w"))

    rep = check_dataset(root, sdf_res=16)
    assert not rep.ok
    text = rep.render()
    assert "pc_sdf_sample" in text           # 1
    assert "absent from 'objects'" in text   # 2a
    assert "outside 1..15" in text           # 2b
    assert "not an integer" in text          # 2c
    assert "param7" in text                  # 3a
    assert "scene_center" in text            # 3b
    assert "expects 14 values" in text       # 4
    assert "lamp" in text                    # 5


def test_missing_root_files(tmp_path):
    rep = check_dataset(str(tmp_path))
    assert not rep.ok
    assert any("classes_bedroom.txt" in e for e in rep.errors)


def test_write_clip_cache_roundtrip(fixture_root):
    n = write_clip_cache(fixture_root)
    assert n > 0
    # re-run is a no-op without overwrite
    assert write_clip_cache(fixture_root) == 0

    rep = check_dataset(fixture_root, sdf_res=16, check_clip=True)
    assert rep.ok, rep.render()
    found, total = rep.stats["clip_pickles_found"].split("/")
    assert found == total

    # the pickle satisfies the reference loader's alignment contract
    # (threedfront_dataset.py:352-371): instance_feats has one row per
    # ordered instance + a trailing room row; every scan instance appears
    from echoscene_tpu.data.clip_text import load_reference_pickle
    rj = json.load(open(os.path.join(
        fixture_root, "relationships_bedroom_trainval.json")))
    scan = rj["scans"][0]
    path = clip_pickle_path(fixture_root, scan["scan"])
    feats, order, rel_feats = load_reference_pickle(path)
    assert feats.shape == (len(order) + 1, 512)
    assert set(int(k) for k in scan["objects"]) == set(int(i) for i in order)
    for phrase, vec in rel_feats.items():
        assert np.asarray(vec).shape == (512,)

    # identical labels get identical rows (the property the loader's
    # order-matching relies on), and the hash backend is deterministic
    mapping = json.load(open(os.path.join(fixture_root, "mapping.json")))
    labels = [mapping[scan["objects"][str(k)]] for k in order]
    for i, a in enumerate(labels):
        for j, b in enumerate(labels):
            if a == b:
                np.testing.assert_array_equal(feats[i], feats[j])

    # scene-rel phrases: with use_scene_rels on, the reference __getitem__
    # builds '<label> in room' for every instance and indexes
    # clip_feats_rel[word] (threedfront_dataset.py:344, :419) — a cache
    # lacking them KeyErrors inside the reference loader
    for lbl in labels:
        assert f"{lbl} in room" in rel_feats, lbl

    # ...and check_dataset flags a cache that lacks them
    with open(path, "rb") as f:
        d = pickle.load(f)
    d["rel_feats"] = {k: v for k, v in d["rel_feats"].items()
                      if not k.endswith(" in room")}
    with open(path, "wb") as f:
        pickle.dump(d, f)
    rep2 = check_dataset(fixture_root, sdf_res=16, check_clip=True)
    assert any("in room" in w for w in rep2.warnings), rep2.render()
    write_clip_cache(fixture_root, overwrite=True)   # restore for later tests


def test_cli_entrypoint(fixture_root, capsys):
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "check_sgfront", os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "scripts", "check_sgfront.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    rc = mod.main(["--dataset", fixture_root, "--sdf_res", "16"])
    out = capsys.readouterr().out
    assert rc == 0 and "RESULT: OK" in out
