"""Shape-consistency metric CLI.

Reference entry point parity: scripts/consistency_check.py — for GT-annotated
identical-object pairs (consistencies_all_test.json), chamfer distance between
the two GENERATED shapes of each pair; per-category + total averages.

This CLI consumes a directory of generated per-scene SDF dumps
(<out>/<scan_id>.npz with arrays 'sdfs' (N,R,R,R) and 'instance_ids' (N,)),
as written by eval with --dump_sdfs.
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from echoscene_tpu.eval.consistency import (  # noqa: E402
    consistency_from_sdfs, aggregate_consistency,
    load_consistency_annotations)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--annotations", required=True,
                   help="consistencies_all_test.json")
    p.add_argument("--generated_dir", required=True,
                   help="dir of <scan_id>.npz generated sdf dumps")
    p.add_argument("--num_points", type=int, default=5000)
    p.add_argument("--clip", default="off",
                   choices=["off", "auto", "pixel", "transformers"],
                   help="also report CLIP image-feature pair distances "
                        "(consistency_check.py:63-75); 'pixel' is a hermetic "
                        "proxy NOT comparable to real-CLIP numbers, "
                        "'transformers' needs local CLIP vision weights, 'auto' uses installed weights (scripts/fetch_weights.py) or falls back to pixel")
    p.add_argument("--clip_model_path", default=None)
    args = p.parse_args(argv)

    clip_enc = None
    clip_results = []
    if args.clip != "off":
        from echoscene_tpu.eval.clip_image import ClipImageEncoder
        clip_enc = ClipImageEncoder(args.clip, args.clip_model_path)

    anns = load_consistency_annotations(args.annotations)
    all_results = []
    for scan_id, groups in anns.items():
        path = os.path.join(args.generated_dir, f"{scan_id}.npz")
        if not os.path.exists(path):
            continue
        data = np.load(path, allow_pickle=True)
        sdfs = data["sdfs"]
        iids = data["instance_ids"]
        cats = None
        if "categories" in data:
            cats = {int(i): str(c) for i, c in zip(iids, data["categories"])}
        by_iid = {int(i): sdfs[k] for k, i in enumerate(iids)}
        all_results.extend(consistency_from_sdfs(
            by_iid, groups, cats, n_points=args.num_points,
            clip_encoder=clip_enc, clip_results=clip_results))

    agg = aggregate_consistency(all_results)
    if clip_enc is not None:
        agg["clip"] = aggregate_consistency(clip_results)
    print(json.dumps(agg, indent=2))
    return agg


if __name__ == "__main__":
    main()
