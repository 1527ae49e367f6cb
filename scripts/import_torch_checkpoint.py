"""Import a reference PyTorch checkpoint into this framework.

Converts `<exp>/checkpoint/model<epoch>.pth` (saved by the reference's
SGDiff.save) into an Orbax checkpoint loadable by our Trainer/eval CLIs:

  python scripts/import_torch_checkpoint.py \
      --pth /path/model100.pth --diff_yaml configs/full_mp.yaml \
      --dataset <sgfront_root> --out <exp>/checkpoint/model100

Per-module numeric parity of the conversion is covered by
tests/test_torch_parity.py (outputs match the reference modules).
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--pth", required=True)
    p.add_argument("--diff_yaml", default="configs/full_mp.yaml")
    p.add_argument("--dataset", required=True,
                   help="SG-FRONT root (for vocab sizes + a template batch)")
    p.add_argument("--room_type", default="bedroom")
    p.add_argument("--network_type", default="echoscene")
    p.add_argument("--out", required=True)
    args = p.parse_args(argv)

    import jax
    import torch
    from echoscene_tpu.convert.torch_import import convert_echoscene_checkpoint
    from echoscene_tpu.data.collate import CollateSpec, collate_scenes
    from echoscene_tpu.data.sgfront import SGFrontDataset
    from echoscene_tpu.models.config import load_config
    from echoscene_tpu.models.sgdiff import SGDiff
    from echoscene_tpu.train.checkpoint import save_checkpoint

    ds = SGFrontDataset(args.dataset, room_type=args.room_type,
                        use_sdf=False, with_changes=False, shuffle_objs=False)
    cfg = load_config(args.diff_yaml, network_type=args.network_type)
    sg = SGDiff(cfg, num_objs=len(ds.classes), num_preds=len(ds.pred_names))

    spec = CollateSpec(max_nodes=32, max_triples=96, max_scenes=1)
    ex = next(e for e in (ds[i] for i in range(len(ds))) if e is not None)
    state = sg.init(jax.random.PRNGKey(0), collate_scenes([ex], spec))

    sd = torch.load(args.pth, map_location="cpu")
    epoch = sd.get("epoch", 0)
    counter = sd.get("counter", 0)
    sd = {k: (v.numpy() if hasattr(v, "numpy") else v) for k, v in sd.items()}
    params, stats = convert_echoscene_checkpoint(sd, cfg)

    # graft converted subtrees over the initialized template (anything the
    # checkpoint lacks keeps its fresh init)
    new_params = dict(state.params)
    for k, v in params.items():
        new_params[k] = v
    new_stats = dict(state.batch_stats)
    for k, v in stats.items():
        new_stats[k] = v
    state = state.replace(
        params=new_params, batch_stats=new_stats,
        step=np.int32(counter), epoch=np.int32(epoch))
    save_checkpoint(args.out, state)
    print(f"[import] {args.pth} (epoch {epoch}, counter {counter}) -> {args.out}")


if __name__ == "__main__":
    main()
