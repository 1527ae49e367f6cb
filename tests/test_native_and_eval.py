"""Native geometry lib + eval-suite tests (renderer, FID, consistency,
pointcloud metrics)."""
import numpy as np
import pytest

from echoscene_tpu import native
from echoscene_tpu.eval.pointcloud_metrics import (
    chamfer_distance, emd_exact, lgan_mmd_cov, knn_two_sample,
    compute_all_metrics, jsd_between_point_cloud_sets)
from echoscene_tpu.eval.consistency import (consistency_from_sdfs,
                                            aggregate_consistency)
from echoscene_tpu.eval.fid import (frechet_distance, kid_score,
                                    random_conv_extractor)
from echoscene_tpu.eval.render import (render_scene_topdown, export_ply,
                                       read_ply, fit_verts_to_box)


def _sphere_sdf(res=24, r=0.5, center=(0, 0, 0)):
    c = np.linspace(-1, 1, res, dtype=np.float32)
    x, y, z = np.meshgrid(c, c, c, indexing="ij")
    return (np.sqrt((x - center[0]) ** 2 + (y - center[1]) ** 2
                    + (z - center[2]) ** 2) - r).astype(np.float32)


def test_native_available():
    assert native.available()


def test_marching_tets_sphere_radius():
    sdf = _sphere_sdf()
    pts = native.sdf_to_point_cloud(sdf, 3000, normalize=False)
    r = np.linalg.norm(pts, axis=1)
    assert abs(r.mean() - 0.5) < 0.02
    assert r.std() < 0.02


def test_marching_tets_welded_manifold():
    """Vertices are welded by lattice edge: the sphere mesh is a closed
    2-manifold (every edge shared by exactly 2 triangles) with ~2 tris per
    vertex instead of the 3-verts-per-tri soup."""
    sdf = _sphere_sdf()
    verts, tris = native.marching_cubes(sdf)
    assert len(tris) > 0
    assert tris.min() >= 0 and tris.max() < len(verts)
    assert len(verts) < 0.6 * len(tris)          # welded, not a soup
    edges = np.sort(np.concatenate(
        [tris[:, [0, 1]], tris[:, [1, 2]], tris[:, [2, 0]]]), axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 2).all()                   # closed surface
    # no degenerate (repeated-index) triangles
    assert (tris[:, 0] != tris[:, 1]).all()
    assert (tris[:, 1] != tris[:, 2]).all()
    assert (tris[:, 2] != tris[:, 0]).all()


def test_native_chamfer_matches_jax(rng):
    a = rng.normal(size=(3, 128, 3)).astype(np.float32)
    b = rng.normal(size=(3, 128, 3)).astype(np.float32)
    native_cd = native.chamfer_batch(a, b)
    jax_cd = chamfer_distance(a, b)
    assert np.allclose(native_cd, jax_cd, rtol=1e-4, atol=1e-5)


def test_native_emd_close_to_exact(rng):
    a = rng.normal(size=(2, 64, 3)).astype(np.float32)
    b = rng.normal(size=(2, 64, 3)).astype(np.float32)
    approx = native.emd_batch(a, b, iters=100)
    exact = emd_exact(a, b)
    assert (approx >= exact - 1e-4).all()        # upper bound
    assert (approx <= exact * 1.15 + 1e-3).all()  # within 15%


def test_mmd_cov_identity(rng):
    pcs = rng.normal(size=(6, 64, 3)).astype(np.float32)
    res = compute_all_metrics(pcs, pcs, batch_size=8, emd_fn=emd_exact)
    assert res["lgan_mmd-CD"] < 1e-6
    assert res["lgan_cov-CD"] == 1.0
    # identical sets -> the 1-NN test cannot tell them apart (acc ~ 0.5)
    assert res["1-NN-CD-acc"] <= 0.6


def test_knn_separated_sets(rng):
    x = rng.normal(size=(10, 3))
    y = rng.normal(size=(10, 3)) + 100.0
    d = lambda a, b: ((a[:, None] - b[None]) ** 2).sum(-1)
    res = knn_two_sample(d(x, x), d(x, y), d(y, y), 1)
    assert res["acc"] == 1.0  # trivially distinguishable


def test_jsd_zero_for_identical(rng):
    pcs = (rng.random(size=(4, 256, 3)).astype(np.float32) - 0.5) * 0.9
    assert abs(jsd_between_point_cloud_sets(pcs, pcs, resolution=12)) < 1e-9


def test_consistency_identical_shapes():
    sdf = _sphere_sdf()
    res = consistency_from_sdfs({1: sdf, 2: sdf, 3: _sphere_sdf(r=0.3)},
                                [[1, 2], [1, 3]],
                                {1: "chair"})
    agg = aggregate_consistency(res)
    # identical spheres: near-zero; different radius: clearly larger
    cds = dict()
    for cat, cd in res:
        cds.setdefault(cat, []).append(cd)
    assert min(cds["chair"]) < 1e-3
    assert max(cds["chair"]) > 1e-2
    assert "total" in agg


def test_renderer_and_ply_roundtrip(tmp_path):
    boxes = np.array([[1, 1, 1, 0, 0, 0, 0.4]], np.float32)
    img = render_scene_topdown([1], boxes, ["_scene_", "chair"])
    assert img.shape == (256, 256, 3)
    assert (img != 255).any()   # something was drawn

    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    tris = np.array([[0, 1, 2]], np.int32)
    p = str(tmp_path / "t.ply")
    export_ply(p, verts, tris)
    v2, f2 = read_ply(p)
    assert np.allclose(v2, verts) and np.array_equal(f2, tris)


def test_fit_verts_to_box_extents():
    verts = np.random.default_rng(0).uniform(-3, 3, size=(100, 3)).astype(np.float32)
    box = [2.0, 1.0, 0.5, 1.0, 0.0, -1.0, 0.0]
    out = fit_verts_to_box(verts, box)
    ext = out.max(0) - out.min(0)
    # axes permuted by the -pi/2 canonical yaw: l<->w swap in x/z extents
    assert np.allclose(sorted(ext), sorted([2.0, 1.0, 0.5]), atol=1e-4)
    # bottom center at (px, py, pz)
    assert abs(out[:, 1].min() - 0.0) < 1e-4


def test_torchscript_extractor_plumbing(tmp_path, rng):
    """'inception:<path>' / 'torchscript:<path>' load a scripted CPU module
    (the standard FID Inception distribution form) and produce (N, D) feats;
    tested with a tiny home-made scripted net since no pretrained weights
    ship in this image."""
    import torch
    from echoscene_tpu.eval.fid import get_extractor

    class TinyNet(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.conv = torch.nn.Conv2d(3, 8, 5, stride=4)

        def forward(self, x):
            return self.conv(x).mean(dim=(2, 3))

    path = str(tmp_path / "feat.pt")
    torch.jit.script(TinyNet()).save(path)
    ext = get_extractor(f"inception:{path}")
    imgs = (rng.random((6, 64, 64, 3)) * 255).astype(np.uint8)
    feats = ext(imgs)
    assert feats.shape == (6, 8)
    assert np.isfinite(feats).all()
    # deterministic across calls
    np.testing.assert_array_equal(feats, ext(imgs))


def test_fid_kid_sanity(rng):
    ext = random_conv_extractor(feature_dim=32)
    imgs1 = (rng.random((12, 64, 64, 3)) * 255).astype(np.uint8)
    imgs2 = (rng.random((12, 64, 64, 3)) * 255).astype(np.uint8)
    f1, f2 = ext(imgs1), ext(imgs2)
    assert f1.shape == (12, 32)
    assert frechet_distance(f1, f1) < 1e-4
    d_self = kid_score(f1, f1, num_subsets=5, subset_size=8)
    d_other = frechet_distance(f1, f2)
    assert abs(d_self) < 1.0
    assert d_other >= 0


def test_consistency_clip_option(tmp_path):
    """--clip pixel path of the consistency metric (consistency_check.py:63-75
    parity surface): pairs of identical shapes score 0 CLIP distance, and the
    aggregate report carries a 'clip' block."""
    import json
    import numpy as np
    from echoscene_tpu.eval.consistency import (aggregate_consistency,
                                                consistency_from_sdfs)
    from echoscene_tpu.eval.clip_image import ClipImageEncoder

    r = 16
    x, y, z = np.meshgrid(*([np.linspace(-1, 1, r)] * 3), indexing="ij")
    sphere = (np.sqrt(x**2 + y**2 + z**2) - 0.6).astype(np.float32)
    cube = (np.maximum.reduce([abs(x), abs(y), abs(z)]) - 0.5).astype(np.float32)
    sdfs = {0: sphere, 1: sphere.copy(), 2: cube, 3: sphere}

    clip_results = []
    res = consistency_from_sdfs(
        sdfs, [[0, 1], [2, 3]], {0: "chair", 2: "table"},
        n_points=500, clip_encoder=ClipImageEncoder("pixel"),
        clip_results=clip_results)
    assert len(res) == 2 and len(clip_results) == 2
    by_cat = dict(clip_results)
    assert by_cat["chair"] < 1e-6          # identical shapes -> 0 distance
    assert by_cat["table"] > 1e-4          # different shapes -> positive
    agg = aggregate_consistency(clip_results)
    assert "total" in agg


def test_numpy_marching_tets_matches_cpp():
    """The pure-NumPy fallback emits the SAME welded mesh as the C++ path
    (identical vertex set, identical triangle set) — ADVICE r4: the fallback
    must uphold the welded-mesh invariants the tests assert elsewhere."""
    if not native.available():
        pytest.skip("native lib unavailable; nothing to compare against")
    res = 21
    g = np.linspace(-1, 1, res, dtype=np.float32)
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    # non-symmetric blob so orientation bugs can't cancel
    sdf = (np.sqrt((X - 0.1) ** 2 + 1.3 * Y ** 2 + Z ** 2) - 0.55
           + 0.08 * np.sin(4 * X)).astype(np.float32)

    v_c, t_c = native.marching_cubes(sdf)
    v_n, t_n = native._marching_tetrahedra_numpy(sdf, 0.0)
    assert v_n.shape == v_c.shape and t_n.shape == t_c.shape
    np.testing.assert_allclose(v_c[np.lexsort(v_c.T)],
                               v_n[np.lexsort(v_n.T)], atol=1e-6)

    def tri_set(v, t):
        p = np.sort(v[t].reshape(len(t), -1).round(5), axis=-1)
        return set(map(tuple, p.tolist()))

    assert tri_set(v_c, t_c) == tri_set(v_n, t_n)
    # welded: vertices shared across triangles
    assert len(v_n) < 3 * len(t_n)


def test_marching_cubes_res_guard():
    """res beyond the 32-bit lattice-id space must error loudly, not weld
    unrelated vertices (ADVICE r4)."""
    with pytest.raises(ValueError, match="1625"):
        native._marching_tetrahedra_numpy(np.zeros((2048, 1, 1), np.float32),
                                          0.0)
