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


def make_requests(classes, rel_dict, n_requests: int, rng,
                  mixed: bool = False):
    """Plain request dicts over real vocabulary entries.

    Fixed-size mode keeps every request at 5 objects (6 nodes with _scene_)
    so 8-scene micro-batches land on one compiled variant.  mixed=True draws
    2-8 objects per request — the online-arrival pattern that churns sampler
    variants; with service warmup + row_buckets it must NOT stall."""
    names = [c for c in classes
             if c not in ("_scene_", "floor") and not c.startswith("_")]
    preds = [p for p in rel_dict]
    reqs = []
    for i in range(n_requests):
        k = int(rng.integers(2, 9)) if mixed else 5
        objs = [names[int(rng.integers(len(names)))] for _ in range(k)]
        triples = []
        for s in range(k - 1):
            triples.append([s, preds[int(rng.integers(len(preds)))], s + 1])
        reqs.append({"objects": objs, "triples": triples})
    return reqs


def concurrent_latency(svc, reqs, window_ms: float, n_clients: int):
    """N concurrent clients each submitting single requests through the
    MicroBatcher — the coalescing path's actual value proposition.  Returns
    (p50_s, p99_s, req_per_sec, batcher_stats)."""
    import threading

    from echoscene_tpu.serve.batcher import MicroBatcher

    mb = MicroBatcher(svc, max_wait_ms=window_ms)
    latencies = []
    lock = threading.Lock()
    chunks = [reqs[i::n_clients] for i in range(n_clients)]

    def client(my_reqs):
        import time as _t
        for r in my_reqs:
            t0 = _t.perf_counter()
            (res,) = mb.generate([r], timeout=600.0)
            dt = _t.perf_counter() - t0
            assert res is not None
            with lock:
                latencies.append(dt)

    t0 = time.perf_counter()
    threads = [threading.Thread(target=client, args=(c,)) for c in chunks]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    stats = mb.stats()
    mb.close()
    import numpy as np
    lat = np.sort(np.asarray(latencies))
    return (float(np.percentile(lat, 50)), float(np.percentile(lat, 99)),
            len(reqs) / wall, stats)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n_requests", type=int, default=16)
    p.add_argument("--protocol", action="store_true",
                   help="time the protocol chains instead of the fast profile")
    p.add_argument("--concurrent", type=int, default=0,
                   help="run the concurrent-clients latency bench with this "
                        "many client threads (p50/p99 vs --windows), "
                        "mixed-size requests, warmed row-bucket service")
    p.add_argument("--windows", default="0,10,50",
                   help="comma list of --batch_window_ms values to sweep")
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

    if args.concurrent:
        # concurrent singles through the MicroBatcher, mixed sizes, warmed
        # row-bucket ladder (VERDICT r4 next #6: the window's value
        # proposition needs a recorded latency/throughput curve)
        svc = GenerationService(sg, state, spec, ds.box_stats, ds.classes,
                                ds.rel_dict, gen_shape=True,
                                result_format="arrays",
                                row_buckets=(16, 32, 48))
        t0 = time.perf_counter()
        nvar = svc.warmup(manips=(False,), verbose=True)
        warm_s = time.perf_counter() - t0
        print(f"warmup: {nvar} variants in {warm_s:.1f}s", flush=True)
        mixed = make_requests(ds.classes, ds.rel_dict, args.n_requests, rng,
                              mixed=True)
        svc.generate(mixed[:4])          # execute-path warm (buffers, CLIP)
        out = {"warmup_s": round(warm_s, 1), "variants": nvar}
        for w in [float(x) for x in args.windows.split(",") if x]:
            p50, p99, rps, stats = concurrent_latency(
                svc, mixed, w, n_clients=args.concurrent)
            tag = f"w{int(w)}"
            out[f"p50_s_{tag}"] = round(p50, 3)
            out[f"p99_s_{tag}"] = round(p99, 3)
            out[f"req_per_sec_{tag}"] = round(rps, 3)
            out[f"mean_batch_{tag}"] = round(stats["mean_batch_size"], 2)
            print(f"[window {w}ms] p50 {p50:.2f}s p99 {p99:.2f}s "
                  f"{rps:.2f} req/s mean_batch "
                  f"{stats['mean_batch_size']:.2f}", flush=True)
        print(json.dumps(out))
        return

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
