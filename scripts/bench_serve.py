"""Serving throughput: GenerationService end-to-end requests/sec on the chip.

The bench.py protocol number times the jitted sampler alone; a serving
deployment additionally pays request parsing, collation, and RESULT
MARSHALING (41 x 64^3 SDF grids -> Python lists is ~10M floats per scene).
This script measures the full GenerationService.generate path at the
opt-in fast profile (int8 + DPM++ 50/20 — the serving configuration,
BASELINE.md) for each (payload, format) pair, so the host-side share is
visible:

  * sdfs / meshes:  raw 64³ grids vs welded marching-tetrahedra meshes
  * json / arrays:  `.tolist()` JSON-ready lists vs numpy buffers
                    (the production serializer format)

NOTE the bench model is untrained — its noise SDFs are the worst case for
mesh extraction (every cell crosses the isosurface; 400k-tri cap reached).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_requests(classes, rel_dict, n_requests: int, rng):
    """Plain request dicts over real vocabulary entries.

    All requests carry the SAME object count (5 + the implicit _scene_ node =
    6 nodes, so 8-scene micro-batches land on one 48-row compiled sampler
    variant — varied counts would trigger recompiles mid-timing)."""
    names = [c for c in classes
             if c not in ("_scene_", "floor") and not c.startswith("_")]
    preds = [p for p in rel_dict]
    reqs = []
    for i in range(n_requests):
        k = 5
        objs = [names[int(rng.integers(len(names)))] for _ in range(k)]
        triples = []
        for s in range(k - 1):
            triples.append([s, preds[int(rng.integers(len(preds)))], s + 1])
        reqs.append({"objects": objs, "triples": triples})
    return reqs


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n_requests", type=int, default=16)
    p.add_argument("--protocol", action="store_true",
                   help="time the protocol chains instead of the fast profile")
    args = p.parse_args(argv)

    import jax
    import numpy as np
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                         "/tmp/echoscene_jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

    from echoscene_tpu.benchmarks import build_flagship
    from echoscene_tpu.data.collate import CollateSpec
    from echoscene_tpu.data.sgfront import SGFrontDataset
    from echoscene_tpu.serve.service import GenerationService

    sg, state, _ = build_flagship(max_nodes=48, max_triples=112,
                                  diffusion_bs=8, batch_scenes=8,
                                  fast_profile=not args.protocol)
    root = os.path.join("/tmp", "echoscene_graft_fake_r64_s8")
    ds = SGFrontDataset(root, use_sdf=True, with_changes=True, seed=0,
                        sdf_res=64)
    spec = CollateSpec(max_nodes=48, max_triples=112, max_scenes=8,
                       diffusion_bs=8, with_sdf=False)
    rng = np.random.default_rng(0)
    reqs = make_requests(ds.classes, ds.rel_dict, args.n_requests, rng)

    out = {}
    for mode, fmt in (("sdfs", "json"), ("sdfs", "arrays"),
                      ("meshes", "json"), ("meshes", "arrays")):
        svc = GenerationService(sg, state, spec, ds.box_stats, ds.classes,
                                ds.rel_dict, gen_shape=True,
                                return_meshes=(mode == "meshes"),
                                result_format=fmt)
        svc.generate(reqs[:8])            # warm: compile + caches
        t0 = time.perf_counter()
        res = svc.generate(reqs)
        dt = time.perf_counter() - t0
        assert len(res) == len(reqs) and all(r is not None for r in res)
        tag = f"{mode}_{fmt}"
        out[f"requests_per_sec_{tag}"] = round(len(reqs) / dt, 4)
        out[f"sec_per_request_{tag}"] = round(dt / len(reqs), 4)
        print(f"[{tag}] {len(reqs)} requests in {dt:.2f}s "
              f"= {len(reqs) / dt:.3f} req/s", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
