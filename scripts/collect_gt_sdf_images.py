"""Render ground-truth scenes to build the FID 'real' image set.

Reference entry point parity: scripts/collect_gt_sdf_images.py:117-158 —
SDF -> mesh -> fit to GT box -> top-down 256^2 render per test scene.
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from echoscene_tpu.core.boxes import descale_box_params  # noqa: E402
from echoscene_tpu.data.sgfront import SGFrontDataset  # noqa: E402
from echoscene_tpu.eval.render import render_scene_topdown, save_png  # noqa: E402


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", required=True)
    p.add_argument("--room_type", default="bedroom")
    p.add_argument("--out", default="./gt_renders")
    p.add_argument("--limit", type=int, default=0)
    p.add_argument("--with_sdf", action="store_true")
    p.add_argument("--sdf_res", type=int, default=64)
    args = p.parse_args(argv)

    ds = SGFrontDataset(args.dataset, split="test", room_type=args.room_type,
                        use_sdf=args.with_sdf, with_changes=False,
                        shuffle_objs=False, sdf_res=args.sdf_res)
    os.makedirs(args.out, exist_ok=True)
    n = args.limit or len(ds)
    for i in range(min(n, len(ds))):
        ex = ds[i]
        if ex is None:
            continue
        boxes6 = descale_box_params(ex.boxes[:, :6], ds.box_stats)
        boxes7 = np.concatenate([boxes6, ex.boxes[:, 6:7]], -1)
        sdfs = None
        if args.with_sdf and ex.sdf_paths is not None:
            sdfs = np.stack([ds.load_sdf(p)[..., 0] for p in ex.sdf_paths])
        img = render_scene_topdown(ex.objs, boxes7,
                                   ds.vocab["object_idx_to_name"], sdfs)
        save_png(img, os.path.join(args.out, f"{ex.scan_id}.png"))
    print(f"[gt renders] wrote into {args.out}")


if __name__ == "__main__":
    main()
