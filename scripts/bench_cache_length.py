"""Per-step decode cost vs KV-cache length: the length-bucket cascade's win.

Every decode step attends over the FULL static cache buffer, so a
300-slot cache pays ~5x the HBM traffic of a 64-slot one even for short
sentences. This measures per-step cost at each bucket size directly
(random weights never emit EOS, so each run executes max_length-2 steps —
per-step cost is total/steps) and reports the implied eval-path speedup
for the reference's sentence-length envelope (~95% of region sentences
are <60 tokens, run_configurations.py:50-51; the reference decodes them
all at max_length=300, evaluate_language_model.py:1204-1205).

Run on the TPU: python scripts/bench_cache_length.py [--rows 192]
[--beams 1] [--buckets 64 128 304]. CPU smoke: --shallow --rows 8.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=192,
                    help="decode rows (regions); 192 = B32 x 6")
    ap.add_argument("--beams", type=int, default=1)
    ap.add_argument("--buckets", type=int, nargs="*", default=[64, 128, 304])
    ap.add_argument("--kv", default="int8", choices=["int8", "none"])
    ap.add_argument("--shallow", action="store_true",
                    help="tiny decoder on CPU (plumbing smoke)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    if args.shallow:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/tests/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import jax.numpy as jnp
    import numpy as np

    from rgrg_tpu.core.config import DecoderConfig, ModelConfig
    from rgrg_tpu.decode.beam import beam_generate
    from rgrg_tpu.decode.greedy import greedy_generate

    if args.shallow:
        dec = DecoderConfig(vocab_size=64, hidden_dim=32, num_heads=2,
                            num_layers=2, max_positions=512,
                            image_feature_dim=64)
    else:
        dec = ModelConfig().decoder
    from rgrg_tpu.models import gpt2

    params = gpt2.init_decoder_params(jax.random.PRNGKey(0), dec)
    if not args.shallow:
        params = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, params)
    kv = jnp.int8 if args.kv == "int8" else None

    feats = jax.random.normal(jax.random.PRNGKey(1),
                              (args.rows, dec.image_feature_dim),
                              jnp.float32) * 0.3

    results = {}
    for L in args.buckets:
        if args.beams > 1:
            def run(f, L=L):
                return beam_generate(params, f, dec, max_length=L,
                                     num_beams=args.beams,
                                     early_stopping=True, cache_dtype=kv)
        else:
            def run(f, L=L):
                return greedy_generate(params, f, dec, max_length=L,
                                       cache_dtype=kv)
        run(feats).block_until_ready()   # compile
        reps = 5
        # vary inputs per rep (axon protocol: identical dispatches can
        # draw fake times); one scalar fetch per rep forces completion.
        # Time reps INDIVIDUALLY and take the best: single tunnel fetches
        # occasionally stall for tens of seconds (measured a 45.8 s fetch
        # amid 0.25 s siblings), which poisons a mean — the min over reps
        # is the least-noisy estimate of the per-step cost. r+1 so no
        # rep matches the warmup input (identical dispatch = fake time).
        inputs = [feats * (1.0 + 0.01 * (r + 1)) for r in range(reps)]
        times = []
        for f in inputs:
            t0 = time.perf_counter()
            float(jnp.sum(run(f)[:, -1]))
            times.append(time.perf_counter() - t0)
        dt = min(times)
        steps = L - 2
        results[str(L)] = {"total_s": round(dt, 4),
                           "per_step_ms": round(dt / steps * 1e3, 3),
                           "rep_times_s": [round(t, 3) for t in times]}
        print(f"cache {L}: best {dt:.3f} s of {reps} "
              f"({dt / steps * 1e3:.3f} ms/step)", file=sys.stderr)

    summary = {"rows": args.rows, "beams": args.beams, "kv": args.kv,
               "shallow": args.shallow, "buckets": results}
    if len(args.buckets) > 1:
        base = results[str(args.buckets[0])]["per_step_ms"]
        top = results[str(args.buckets[-1])]["per_step_ms"]
        summary["per_step_ratio_largest_vs_smallest"] = round(top / base, 2)
    print(json.dumps(summary, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=2)
            f.write("\n")


if __name__ == "__main__":
    main()
