"""Shape-consistency metric: chamfer distance between generated meshes of
annotated identical-object pairs.

Behavioral reference: scripts/consistency_check.py:56-117 — for each scene in
`consistencies_all_test.json` (mapping scan_id -> list of instance-id groups
that are the same 3D-FUTURE object), compute the chamfer distance between the
5k-point surface samples of each generated pair, then report per-category and
total averages.  Lower = more consistent (the shared-initial-noise echo
sampling is what this metric validates).
"""
from __future__ import annotations

import itertools
import json
from collections import defaultdict
from typing import Dict, List, Optional, Sequence

import numpy as np

from .. import native


def pair_chamfer(points_a: np.ndarray, points_b: np.ndarray) -> float:
    """Chamfer between two (N,3) clouds (consistency_check.py:87-89)."""
    return float(native.chamfer_batch(points_a[None], points_b[None])[0])


def consistency_from_sdfs(sdf_by_instance: Dict[int, np.ndarray],
                          groups: Sequence[Sequence[int]],
                          category_by_instance: Optional[Dict[int, str]] = None,
                          n_points: int = 5000, seed: int = 0,
                          clip_encoder=None, clip_results=None):
    """Score one scene.

    sdf_by_instance: instance id -> (R,R,R[,1]) generated SDF grid.
    groups: lists of instance ids annotated as the same object.
    Returns list of (category, chamfer) tuples over all in-group pairs.

    clip_encoder: optional eval.clip_image.ClipImageEncoder — also scores the
    CLIP image-feature distance of each pair's rendered shapes
    (consistency_check.py:63-75), appended to `clip_results` as
    (category, distance) tuples.
    """
    results = []
    clouds: Dict[int, np.ndarray] = {}
    feats: Dict[int, np.ndarray] = {}

    def feat(iid):
        if iid not in feats:
            from .render import render_sdf_grid
            grid = np.asarray(sdf_by_instance[iid], np.float32)
            if grid.ndim == 4:
                grid = grid[..., 0]
            img = render_sdf_grid(grid, image_size=224)
            feats[iid] = clip_encoder.encode(img)
        return feats[iid]

    def cloud(iid):
        if iid not in clouds:
            grid = np.asarray(sdf_by_instance[iid], np.float32)
            if grid.ndim == 4:
                grid = grid[..., 0]
            # keep canonical grid scale: consistency compares raw generated
            # geometry, unit-normalisation would hide size differences
            clouds[iid] = native.sdf_to_point_cloud(grid, n_points, seed=seed,
                                                    normalize=False)
        return clouds[iid]

    for group in groups:
        members = [g for g in group if g in sdf_by_instance]
        for a, b in itertools.combinations(members, 2):
            cd = pair_chamfer(cloud(a), cloud(b))
            cat = (category_by_instance or {}).get(a, "all")
            results.append((cat, cd))
            if clip_encoder is not None and clip_results is not None:
                d = float(np.linalg.norm(feat(a) - feat(b)))
                clip_results.append((cat, d))
    return results


def aggregate_consistency(results) -> Dict[str, float]:
    """Per-category + total averages (consistency_check.py:102-111)."""
    by_cat = defaultdict(list)
    for cat, cd in results:
        by_cat[cat].append(cd)
    out = {cat: float(np.mean(v)) for cat, v in by_cat.items()}
    allv = [cd for _, cd in results]
    out["total"] = float(np.mean(allv)) if allv else float("nan")
    return out


def load_consistency_annotations(path: str) -> Dict[str, List[List[int]]]:
    """consistencies_all_test.json format: scan_id -> groups of instance ids."""
    with open(path) as f:
        return json.load(f)
