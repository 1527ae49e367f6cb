"""Compute the centered-bounds box-stats file for a dataset.

The reference ships `centered_bounds_<room>_trainval.txt` precomputed; this
tool derives it from the raw obj_boxes json so new datasets/room types can be
onboarded without the original pipeline.  Layout (14 floats, one row):
min_lhw(3) max_lhw(3) min_xyz(3) max_xyz(3) min_angle max_angle
(helpers/util.py:519-520).
"""
import argparse
import json
import os
import sys

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", required=True)
    p.add_argument("--room_type", default="bedroom")
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    path = os.path.join(args.dataset,
                        f"obj_boxes_{args.room_type}_trainval.json")
    with open(path) as f:
        data = json.load(f)
    params = []
    for sid, boxes in data.items():
        center = np.asarray(boxes["scene_center"], np.float64)
        for k, v in boxes.items():
            if k == "scene_center" or not isinstance(v, dict):
                continue
            if "param7" not in v:
                continue
            b = np.asarray(v["param7"], np.float64).copy()
            b[3:6] -= center
            params.append(b)
    params = np.stack(params)
    stats = np.concatenate([
        params[:, :3].min(0), params[:, :3].max(0),
        params[:, 3:6].min(0), params[:, 3:6].max(0),
        [params[:, 6].min()], [params[:, 6].max()],
    ])
    out = args.out or os.path.join(
        args.dataset, f"centered_bounds_{args.room_type}_trainval.txt")
    np.savetxt(out, stats.reshape(1, -1))
    print(f"[box stats] {len(params)} boxes -> {out}")
    print(stats)


if __name__ == "__main__":
    main()
