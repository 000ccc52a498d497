"""A/B weight-only int8 decoder kernels vs bf16 on the real chip.

Greedy decode at the product shape (192 rows, 60 tokens, int8 KV cache)
is memory-bound at ~60% of v5e HBM peak (bench.py roofline), and the
bf16 per-layer kernels are the LARGEST per-step stream (~710 MB vs
~580 MB int8 KV). gpt2.quantize_decoder_weights halves them; the int8 ->
bf16 convert fuses into each dot's operand read so HBM traffic stays
int8 (the same fusion the KV cache rides). Speed-of-light: step bytes
1.42 GB -> 1.06 GB = up to 1.33x on decode.

Also A/Bs the beam-4 path (expected ~neutral: beam streams a 4.6 GB
packed KV cache per step, params are 15% of its bytes).

Protocol (CLAUDE.md): interleaved A/B within ONE process, best-of-N,
varied inputs per rep, one device_get per run.

Writes docs/artifacts/weights_int8_ab.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REGIONS = 6
TOKENS = 60


def bench_decode(model, params, batch, beams, reps=4):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    sel = np.zeros((batch, 29), bool)
    for i in range(batch):
        sel[i, rng.choice(29, REGIONS, replace=False)] = True
    sel = jnp.asarray(sel)
    r_budget = model.budget_for(batch * REGIONS, batch)

    kv = jnp.int8 if beams == 1 else jnp.bfloat16  # serving defaults

    def run(feats):
        out = model.decode_selected(
            params, feats, sel, r_budget, TOKENS, num_beams=beams,
            early_stopping=beams > 1, kv_cache_dtype=kv)
        return jax.device_get(out[0])[0, 0, :4]

    feats0 = jnp.asarray(
        rng.normal(0, 1, (batch, 29, 1024)).astype(np.float32))
    run(feats0)  # compile
    times = []
    for r in range(reps):
        feats = feats0 * (1.0 + 0.01 * (r + 1))
        t0 = time.time()
        run(feats)
        times.append(time.time() - t0)
    return min(times), r_budget


def main():
    import jax
    from rgrg_tpu.models import gpt2
    import bench as B

    B.wait_for_backend()
    model, params = B.build()
    params_q = dict(params)
    params_q["decoder"] = gpt2.quantize_decoder_weights(params["decoder"])

    out = {"tokens": TOKENS, "regions_per_report": REGIONS, "ab": {}}
    for mode, beams, batch in (("greedy", 1, 32), ("beam4", 4, 32)):
        rec = {"bf16_s": [], "int8w_s": []}
        rb = None
        for _ in range(3):
            s, rb = bench_decode(model, params, batch, beams)
            rec["bf16_s"].append(round(s, 4))
            s, _ = bench_decode(model, params_q, batch, beams)
            rec["int8w_s"].append(round(s, 4))
        f, q = min(rec["bf16_s"]), min(rec["int8w_s"])
        steps = TOKENS - 2
        out["ab"][f"{mode}_B{batch}"] = {
            **rec, "r_budget": rb,
            "bf16_rps": round(batch / f, 2),
            "int8w_rps": round(batch / q, 2),
            "bf16_ms_per_step": round(f / steps * 1e3, 2),
            "int8w_ms_per_step": round(q / steps * 1e3, 2),
            "int8w_speedup": round(f / q, 3)}
        print(f"{mode} B{batch}: int8w {batch/q:.1f} r/s vs bf16 "
              f"{batch/f:.1f} r/s ({q/steps*1e3:.2f} vs "
              f"{f/steps*1e3:.2f} ms/step)", file=sys.stderr)
        jax.clear_caches()

    print(json.dumps(out, indent=2))
    path = "docs/artifacts/weights_int8_ab.json"
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")


if __name__ == "__main__":
    main()
