"""A/B the beam-4 KV-cache dtype on the real chip: int8 vs bf16.

Round-3 finding (BENCH_r03 BEAM_PRODUCT_KV note): the int8 cache CRATERED
beam-4 at B=32 (10.4 vs 18.8 r/s) because decode_step_beam dequantizes the
full [H,BK,T,D] buffer into a materialized bf16 copy every layer/step.
Round 4 (VERDICT #6) prototyped a full int8 x int8 MXU formulation
(per-step absmax-requantized q + vs-folded softmax weights, int32
accumulation, scales outside the dots): measured 3.2x SLOWER than bf16
(96.2 vs 29.7 ms/step at B=32, same-phase interleaved) — the per-step
requantizations and f32 score traffic cost more than the dequant copy they
remove, so the prototype was reverted and the negative result recorded in
docs/artifacts/beam_int8_ab.json + decode_step_beam's docstring. This
script measures the SHIPPED dequant path vs bf16, within ONE process (same
tunnel phase), best-of-N per arm, A/B interleaved.

Run on TPU: python scripts/bench_beam_int8_ab.py [--batch 32] [--reps 5]
CPU smoke:  python scripts/bench_beam_int8_ab.py --shallow --reps 2
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--regions", type=int, default=6)
    ap.add_argument("--max-length", type=int, default=60)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--shallow", action="store_true")
    ap.add_argument("--out", default="docs/artifacts/beam_int8_ab.json")
    args = ap.parse_args()

    import jax

    if args.shallow:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/tests/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import jax.numpy as jnp

    from rgrg_tpu.core.config import DecoderConfig, ModelConfig
    from rgrg_tpu.decode.beam import beam_generate
    from rgrg_tpu.models import gpt2

    dec = (DecoderConfig(vocab_size=64, hidden_dim=32, num_heads=2,
                         num_layers=2, max_positions=128, image_feature_dim=64)
           if args.shallow else ModelConfig().decoder)
    params = gpt2.init_decoder_params(jax.random.PRNGKey(0), dec)
    if not args.shallow:
        params = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, params)

    rows = args.batch * args.regions
    feats = jax.random.normal(jax.random.PRNGKey(1),
                              (rows, dec.image_feature_dim),
                              jnp.float32) * 0.3

    arms = {"int8": jnp.int8, "bf16": jnp.bfloat16}
    results = {}

    def run(kv, scale):
        ids = beam_generate(params, feats * scale, dec,
                            max_length=args.max_length, num_beams=4,
                            early_stopping=True, cache_dtype=kv)
        float(jnp.sum(ids[:, -1]))

    for name, kv in arms.items():   # compile both before timing either
        run(kv, 1.0)

    times = {name: [] for name in arms}
    for r in range(args.reps):      # interleave arms within each rep
        for name, kv in arms.items():
            t0 = time.perf_counter()
            run(kv, 1.0 + 0.01 * (r + 1))
            times[name].append(time.perf_counter() - t0)

    steps = args.max_length - 2
    for name in arms:
        dt = min(times[name])
        results[name] = {
            "total_s": round(dt, 3),
            "per_step_ms": round(dt / steps * 1e3, 3),
            "reports_per_sec": round(args.batch / dt, 2),
            "rep_times_s": [round(t, 3) for t in times[name]],
        }
    results["config"] = {"batch": args.batch, "rows": rows,
                         "max_length": args.max_length,
                         "shallow": args.shallow,
                         "platform": jax.devices()[0].platform}
    results["int8_vs_bf16"] = round(
        results["bf16"]["per_step_ms"] / results["int8"]["per_step_ms"], 3)
    print(json.dumps(results, indent=2))
    if args.out:
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
            f.write("\n")


if __name__ == "__main__":
    main()
