"""Scene assembly + top-down rendering (the FID input images).

Behavioral reference: helpers/visualize_scene.py (render_full :241-326,
render_box :156-239, render_img :122-153) and helpers/util.py
fit_shapes_to_box_v2 (:158-189) / get_rotation_3dfront (:507-513).
Pipeline: per-object SDF grid -> isosurface mesh (native marching
tetrahedra) -> canonical correction (-pi/2 yaw, bottom-center origin) ->
anisotropic scale into the predicted box -> yaw + translate into the scene ->
floor plane -> software top-down perspective render at y=8, yfov=pi/2, 256^2
(the reference's pyrender camera), exported via the native rasterizer.

Mesh/texture fidelity intentionally simplified to flat per-class colors —
the FID protocol compares distributions of these renders between real and
generated scenes, both produced by THIS renderer.
"""
from __future__ import annotations

import hashlib
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .. import native


def get_rotation_3dfront(y_rad: float) -> np.ndarray:
    """Yaw about +y (helpers/util.py:507-513, radians)."""
    c, s = np.cos(y_rad), np.sin(y_rad)
    return np.array([[c, 0, -s], [0, 1, 0], [s, 0, c]], np.float64)


def class_color(name: str) -> np.ndarray:
    h = hashlib.sha256(name.encode()).digest()
    return (np.array([h[0], h[1], h[2]], np.float32) / 255.0) * 0.7 + 0.2


def fit_verts_to_box(verts: np.ndarray, box7: Sequence[float]) -> np.ndarray:
    """Place canonical mesh verts into a world box (fit_shapes_to_box_v2).

    verts: (V, 3) arbitrary units.  box7 = [l, h, w, px, py, pz, angle];
    (px,py,pz) bottom center, angle = yaw (radians).
    """
    l, h, w, px, py, pz, angle = [float(v) for v in box7]
    v = np.asarray(verts, np.float32)
    # bottom-center the canonical mesh then apply the -pi/2 yaw correction
    lo, hi = v.min(0).astype(np.float64), v.max(0).astype(np.float64)
    center = (lo + hi) / 2
    center[1] = lo[1]
    R1 = get_rotation_3dfront(-np.pi / 2)
    # the -pi/2 yaw permutes x/z (up to ~1e-16 cross terms), so the rotated
    # per-axis extent is |R1| @ extent — computed on the (3,) stats, not the
    # vertex array
    ext = np.abs(R1) @ (hi - lo)
    ext[ext < 1e-8] = 1.0
    scale = np.array([l, h, w]) / ext
    # yaw + translate (T = [R_inv | t], fit_shapes_to_box_v2 :176-185).
    # The whole chain ((v-c) @ R1.T * s) @ R2inv.T + t collapses to one
    # affine map v @ M + off — a single f32 pass over the vertex array
    # (meshes from 64^3 grids reach ~1e6 rows; the multi-pass form dominated
    # serving-path profiles).
    R2_inv = np.linalg.inv(get_rotation_3dfront(angle))
    M = (R1.T * scale[None, :]) @ R2_inv.T
    off = np.array([px, py, pz]) - center @ M
    return (v @ M.astype(np.float32) + off.astype(np.float32)).astype(np.float32)


def box_mesh(box7: Sequence[float]) -> Tuple[np.ndarray, np.ndarray]:
    """Solid box mesh (12 tris) for layout-only rendering (render_box)."""
    l, h, w, px, py, pz, angle = [float(v) for v in box7]
    xs = np.array([-w / 2, w / 2])
    ys = np.array([0.0, h])
    zs = np.array([-l / 2, l / 2])
    corners = np.array([[x, y, z] for x in xs for y in ys for z in zs])
    R = np.linalg.inv(get_rotation_3dfront(angle))
    corners = corners @ R.T + np.array([px, py, pz])
    faces = np.array([
        [0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
        [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3],
        [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6]], np.int32)
    return corners.astype(np.float32), faces


def sdf_to_canonical_mesh(sdf_grid: np.ndarray, level: float = 0.0):
    """SDF grid -> mesh in [-1, 1]^3 voxel-centered coordinates."""
    grid = np.asarray(sdf_grid, np.float32)
    if grid.ndim == 4:
        grid = grid[..., 0]
    verts, tris = native.marching_cubes(grid, level)
    if len(tris) == 0:
        return verts, tris
    res = grid.shape[0]
    verts = verts / (res - 1) * 2.0 - 1.0
    return verts, tris


HIGHLIGHT_COLOR = np.array([0.95, 0.08, 0.08], np.float32)


def assemble_scene(objs: Sequence[int], boxes7: np.ndarray,
                   class_names: Sequence[str],
                   sdfs: Optional[np.ndarray] = None,
                   skip_classes: Sequence[str] = ("_scene_",),
                   without_lamp: bool = True,
                   floor_extent: float = 5.0,
                   highlight: Optional[Sequence[bool]] = None):
    """-> (verts (V,3), tris (T,3), tri_colors (T,3)) for the whole scene.

    `highlight[i]` truthy tints object i toward red — the manipulation
    overlay (reference render_box/render_full `mani` modes splice
    manipulated-node meshes into the pre-manipulation scene,
    helpers/visualize_scene.py:156-239; here changed nodes are tinted in
    one render instead, which distinguishes them equally and stays
    single-pass)."""
    all_v: List[np.ndarray] = []
    all_t: List[np.ndarray] = []
    all_c: List[np.ndarray] = []
    off = 0

    def add(v, t, color):
        nonlocal off
        if len(t) == 0:
            return
        all_v.append(v)
        all_t.append(t + off)
        all_c.append(np.tile(color[None], (len(t), 1)))
        off += len(v)

    # floor plane (create_bg analog, helpers/visualize_scene.py:58-118)
    fv = np.array([[-floor_extent, 0, -floor_extent],
                   [floor_extent, 0, -floor_extent],
                   [floor_extent, 0, floor_extent],
                   [-floor_extent, 0, floor_extent]], np.float32)
    add(fv, np.array([[0, 2, 1], [0, 3, 2]], np.int32),
        np.array([0.85, 0.85, 0.85], np.float32))

    for i, cid in enumerate(objs):
        name = class_names[int(cid)].rstrip("\n")
        if name in skip_classes:
            continue
        if without_lamp and name == "lamp":
            continue
        color = class_color(name)
        if highlight is not None and bool(highlight[i]):
            color = 0.45 * color + 0.55 * HIGHLIGHT_COLOR
        if sdfs is not None and np.abs(sdfs[i]).sum() > 1e-6:
            cv, ct = sdf_to_canonical_mesh(sdfs[i])
            if len(ct) == 0:
                cv, ct = box_mesh(boxes7[i])
                add(cv, ct, color)
                continue
            cv = fit_verts_to_box(cv, boxes7[i])
            add(cv, ct, color)
        else:
            cv, ct = box_mesh(boxes7[i])
            add(cv, ct, color)

    if not all_v:
        return (np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32),
                np.zeros((0, 3), np.float32))
    return (np.concatenate(all_v), np.concatenate(all_t).astype(np.int32),
            np.concatenate(all_c))


def render_scene_topdown(objs, boxes7, class_names, sdfs=None,
                         image_size: int = 256, **kw) -> np.ndarray:
    verts, tris, colors = assemble_scene(objs, boxes7, class_names, sdfs, **kw)
    return native.rasterize_topdown(verts, tris, colors,
                                    width=image_size, height=image_size)


def render_sdf_grid(sdf_grid: np.ndarray, image_size: int = 256,
                    cam_height: float = 2.2) -> np.ndarray:
    """Single-object SDF preview render (the render_sdf role in train-time
    logging, model/diff_utils/util_3d.py:350)."""
    verts, tris = sdf_to_canonical_mesh(sdf_grid)
    if len(tris) == 0:
        return np.full((image_size, image_size, 3), 255, np.uint8)
    colors = np.tile(np.array([[0.5, 0.6, 0.8]], np.float32), (len(tris), 1))
    # tilt the object so a top-down camera shows shape detail
    tilt = np.deg2rad(55)
    R = np.array([[1, 0, 0],
                  [0, np.cos(tilt), -np.sin(tilt)],
                  [0, np.sin(tilt), np.cos(tilt)]], np.float32)
    verts = verts @ R.T
    verts[:, 1] -= verts[:, 1].min()
    return native.rasterize_topdown(verts, tris, colors, width=image_size,
                                    height=image_size, cam_height=cam_height)


def turntable_gif(sdf_grid: np.ndarray, path: str, frames: int = 12,
                  image_size: int = 128, cam_height: float = 2.2):
    """Rotating-object GIF (model/diff_utils/util_3d.py:58-92 role)."""
    from PIL import Image
    verts, tris = sdf_to_canonical_mesh(sdf_grid)
    if len(tris) == 0:
        return
    colors = np.tile(np.array([[0.5, 0.6, 0.8]], np.float32), (len(tris), 1))
    tilt = np.deg2rad(55)
    Rt = np.array([[1, 0, 0],
                   [0, np.cos(tilt), -np.sin(tilt)],
                   [0, np.sin(tilt), np.cos(tilt)]], np.float32)
    imgs = []
    for k in range(frames):
        R = get_rotation_3dfront(2 * np.pi * k / frames).astype(np.float32)
        v = (verts @ R.T) @ Rt.T
        v[:, 1] -= v[:, 1].min()
        img = native.rasterize_topdown(v.astype(np.float32), tris, colors,
                                       width=image_size, height=image_size,
                                       cam_height=cam_height)
        imgs.append(Image.fromarray(img))
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    imgs[0].save(path, save_all=True, append_images=imgs[1:], duration=120,
                 loop=0)


def save_png(img: np.ndarray, path: str):
    from PIL import Image
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(img).save(path)


def export_obj(path: str, verts: np.ndarray, tris: np.ndarray):
    """ASCII OBJ export (render_full's per-object .obj outputs)."""
    with open(path, "w") as f:
        for v in verts:
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for t in tris:
            f.write(f"f {t[0] + 1} {t[1] + 1} {t[2] + 1}\n")


def export_ply(path: str, verts: np.ndarray, tris: Optional[np.ndarray] = None):
    """ASCII PLY writer (dataset/util.py:5-109 role)."""
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(verts)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        if tris is not None:
            f.write(f"element face {len(tris)}\n")
            f.write("property list uchar int vertex_indices\n")
        f.write("end_header\n")
        for v in verts:
            f.write(f"{v[0]} {v[1]} {v[2]}\n")
        if tris is not None:
            for t in tris:
                f.write(f"3 {t[0]} {t[1]} {t[2]}\n")


def export_glb(path: str, verts: np.ndarray, tris: np.ndarray,
               tri_colors: Optional[np.ndarray] = None):
    """Binary glTF 2.0 scene export (render_full/render_box export a trimesh
    Scene .glb per scene, helpers/visualize_scene.py:313, :228).

    Self-contained writer (no trimesh in this image): one non-indexed
    triangle primitive with POSITION + COLOR_0 vertex attributes; flat
    per-triangle colors are realised by de-indexing (3 verts per tri).
    """
    import json as _json
    import struct

    verts = np.asarray(verts, np.float32)
    tris = np.asarray(tris, np.int64).reshape(-1, 3)
    if len(tris) == 0:
        # glTF 2.0 requires accessor.count >= 1; an empty scene produces no
        # valid primitive, so write nothing (strict viewers reject count=0)
        return
    pos = verts[tris.reshape(-1)]                      # (3T, 3) de-indexed
    if tri_colors is None:
        tri_colors = np.tile(np.array([[0.6, 0.6, 0.6]], np.float32),
                             (len(tris), 1))
    col = np.repeat(np.asarray(tri_colors, np.float32), 3, axis=0)
    n = len(pos)

    pos_b = pos.astype("<f4").tobytes()
    col_b = col.astype("<f4").tobytes()
    bin_blob = pos_b + col_b
    pad_bin = (-len(bin_blob)) % 4
    bin_blob += b"\x00" * pad_bin

    if n:
        pmin = [float(x) for x in pos.min(0)]
        pmax = [float(x) for x in pos.max(0)]
    else:
        pmin = pmax = [0.0, 0.0, 0.0]
    gltf = {
        "asset": {"version": "2.0", "generator": "echoscene_tpu"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0}],
        "meshes": [{"primitives": [
            {"attributes": {"POSITION": 0, "COLOR_0": 1}, "mode": 4}]}],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": n,
             "type": "VEC3", "min": pmin, "max": pmax},
            {"bufferView": 1, "componentType": 5126, "count": n,
             "type": "VEC3"},
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": len(pos_b),
             "target": 34962},
            {"buffer": 0, "byteOffset": len(pos_b), "byteLength": len(col_b),
             "target": 34962},
        ],
        "buffers": [{"byteLength": len(bin_blob)}],
    }
    json_blob = _json.dumps(gltf, separators=(",", ":")).encode()
    json_blob += b" " * ((-len(json_blob)) % 4)

    total = 12 + 8 + len(json_blob) + 8 + len(bin_blob)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(struct.pack("<4sII", b"glTF", 2, total))
        f.write(struct.pack("<I4s", len(json_blob), b"JSON"))
        f.write(json_blob)
        f.write(struct.pack("<I4s", len(bin_blob), b"BIN\x00"))
        f.write(bin_blob)


def read_glb(path: str):
    """Read back an export_glb file -> (positions (N,3), colors (N,3))."""
    import json as _json
    import struct

    with open(path, "rb") as f:
        magic, version, _length = struct.unpack("<4sII", f.read(12))
        assert magic == b"glTF" and version == 2, (magic, version)
        jlen, jtype = struct.unpack("<I4s", f.read(8))
        assert jtype == b"JSON"
        gltf = _json.loads(f.read(jlen))
        blen, btype = struct.unpack("<I4s", f.read(8))
        assert btype == b"BIN\x00"
        blob = f.read(blen)
    prim = gltf["meshes"][0]["primitives"][0]

    def acc_data(idx):
        acc = gltf["accessors"][idx]
        bv = gltf["bufferViews"][acc["bufferView"]]
        off = bv.get("byteOffset", 0)
        raw = blob[off:off + bv["byteLength"]]
        return np.frombuffer(raw, "<f4").reshape(acc["count"], 3)

    return (acc_data(prim["attributes"]["POSITION"]),
            acc_data(prim["attributes"]["COLOR_0"]))


def read_ply(path: str):
    """Minimal ASCII PLY reader (dataset/util.py role)."""
    with open(path) as f:
        assert f.readline().strip() == "ply"
        n_verts = n_faces = 0
        line = f.readline()
        while line and not line.startswith("end_header"):
            parts = line.split()
            if parts[0] == "element" and parts[1] == "vertex":
                n_verts = int(parts[2])
            if parts[0] == "element" and parts[1] == "face":
                n_faces = int(parts[2])
            line = f.readline()
        verts = np.array([[float(x) for x in f.readline().split()[:3]]
                          for _ in range(n_verts)], np.float32)
        faces = np.array([[int(x) for x in f.readline().split()[1:4]]
                          for _ in range(n_faces)], np.int32) if n_faces else None
    return verts, faces
