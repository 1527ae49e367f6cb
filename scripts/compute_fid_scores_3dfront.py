"""FID/KID between real and generated top-down renders.

Reference entry point parity: scripts/compute_fid_scores_3dfront.py — two
directories of 256^2 renders, room-type filename filtering, FID + KID.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from echoscene_tpu.eval.fid import compute_fid_kid  # noqa: E402


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--path_to_real_renderings", required=True)
    p.add_argument("--path_to_synthesized_renderings", required=True)
    p.add_argument("--room_type", default="all",
                   choices=["bedroom", "livingroom", "diningroom", "library",
                            "all"])
    p.add_argument("--extractor", default="auto",
               help="'auto' = installed Inception weights (scripts/fetch_weights.py) if present, else the random-conv proxy; or 'inception:<path>' / 'torchscript:<path>' / 'random'")
    args = p.parse_args(argv)
    res = compute_fid_kid(args.path_to_real_renderings,
                          args.path_to_synthesized_renderings,
                          room_type=args.room_type, extractor=args.extractor)
    print(json.dumps(res, indent=2))
    return res


if __name__ == "__main__":
    main()
