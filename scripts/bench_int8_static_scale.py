"""A/B: int8 fast-profile generation with dynamic vs fixed activation scales.

VERDICT r2 next-#6 candidate: "fold the GN+SiLU elementwise passes into the
int8 quant/dequant path".  With a STATIC activation scale the quantize is a
pure elementwise epilogue (mul+round+clip) that XLA fuses into the producing
GN+SiLU pass, and the per-conv abs-max reduction pass disappears.  The
ECHOSCENE_INT8_FIXED_SCALE hook (nn/quant.py) measures the UPPER BOUND of
that win without building the calibration machinery: values are wrong
(clipping), timing is the point.

Run twice (fresh process each — the flag is read at trace time):
    python scripts/bench_int8_static_scale.py            # dynamic abs-max
    ECHOSCENE_INT8_FIXED_SCALE=0.05 \
        python scripts/bench_int8_static_scale.py        # static upper bound
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import json

    from echoscene_tpu.benchmarks import build_flagship, time_generation

    batch_scenes = 8
    sg, state, batch = build_flagship(max_nodes=48, max_triples=112,
                                      diffusion_bs=8,
                                      batch_scenes=batch_scenes,
                                      fast_profile=True)
    sps = time_generation(sg, state, batch, batch_scenes)
    print(json.dumps({
        "mode": ("fixed:" + os.environ["ECHOSCENE_INT8_FIXED_SCALE"])
                if os.environ.get("ECHOSCENE_INT8_FIXED_SCALE") else "dynamic",
        "fast_profile_scenes_per_sec": round(sps, 4),
    }))


if __name__ == "__main__":
    main()
