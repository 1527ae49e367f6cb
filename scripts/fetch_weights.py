#!/usr/bin/env python
"""One-command real-weights installation (VERDICT r3 Next #6).

The hermetic image ships no pretrained extractor/encoder weights, so FID
uses a random-conv proxy and CLIP conditioning a hash proxy.  The day real
weights are available (files on disk or URLs where egress exists), this
installs them and every 'auto' backend flips with ZERO code changes:

    python scripts/fetch_weights.py \
        --inception /path/to/pt_inception-2015-12-05.pt \
        --clip /path/to/clip-vit-base-patch32/     # HF snapshot directory

Then:
  * scripts/compute_fid_scores_3dfront.py (default --extractor auto) scores
    with the JAX-native FID-Inception port (reference:
    scripts/compute_fid_scores_3dfront.py:132-161 uses clean-fid's
    pt_inception-2015-12-05.pt),
  * train/cli (default --clip_backend auto) conditions on real CLIP text
    features (reference: dataset/threedfront_dataset.py:157-163), recording
    the resolved backend in args.json,
  * consistency_check --clip auto scores with the CLIP vision tower.

`--smoke` runs a forward through each installed backend (also run by
tests/test_real_weights.py, skipif-absent).
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def smoke(report: dict) -> bool:
    import numpy as np

    from echoscene_tpu.weights import clip_text_dir, inception_weights

    ok = True
    inc = inception_weights()
    if inc:
        from echoscene_tpu.eval.fid import get_extractor
        feats = get_extractor("auto")(
            np.random.default_rng(0).integers(
                0, 255, size=(2, 299, 299, 3)).astype(np.uint8))
        assert feats.shape == (2, 2048), feats.shape
        report["inception_smoke"] = f"ok {feats.shape}"
    else:
        report["inception_smoke"] = "skipped (not installed)"
        ok = False
    clip = clip_text_dir()
    if clip:
        from echoscene_tpu.data.clip_text import ClipTextEncoder
        from echoscene_tpu.eval.clip_image import ClipImageEncoder
        enc = ClipTextEncoder("auto")
        assert enc.backend == "transformers", enc.backend
        v = enc.encode("a bed close by a wardrobe")
        assert v.shape == (512,) and np.isfinite(v).all()
        img_enc = ClipImageEncoder("auto")
        assert img_enc.backend == "transformers", img_enc.backend
        f = img_enc.encode(np.zeros((64, 64, 3), np.uint8))
        assert f.shape == (512,) and np.isfinite(f).all()
        report["clip_smoke"] = "ok text+vision (512,)"
    else:
        report["clip_smoke"] = "skipped (not installed)"
        ok = False
    return ok


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--inception", default=None,
                   help="pt_inception-2015-12-05.pt / .npz path or URL")
    p.add_argument("--clip", default=None,
                   help="HuggingFace CLIP ViT-B/32 snapshot directory")
    p.add_argument("--smoke", action="store_true",
                   help="forward-check the installed real backends")
    args = p.parse_args(argv)

    from echoscene_tpu.weights import install_clip, install_inception, status

    if args.inception:
        print("installed:", install_inception(args.inception))
    if args.clip:
        print("installed:", install_clip(args.clip))
    report = dict(status())
    if args.smoke:
        smoke(report)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
