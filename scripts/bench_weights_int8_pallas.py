"""A/B the Pallas-consumed int8 decoder kernels on the real chip.

Three arms, interleaved in ONE process (CLAUDE.md protocol: best-of-N,
varied inputs per rep, one device_get per run, never compare across
tunnel phases):

  bf16    — shipped default (bf16 kernels, int8 KV for greedy / bf16
            packed for beam)
  int8w   — gpt2.quantize_decoder_weights layout="xla": measured NEUTRAL
            (docs/artifacts/weights_int8_ab.json) because XLA hoists the
            loop-invariant dequant out of the decode while_loop
  pallas  — layout="pallas": ops/dense_wint8_pallas.py consumes the int8
            buffers directly, dequant in VMEM inside the kernel — nothing
            to hoist, per-step weight HBM traffic stays int8
            (~590 MB bf16 -> ~295 MB for the per-layer kernels).

Speed-of-light for greedy at 192 rows: step bytes 1.42 GB -> ~1.13 GB
(lm_head + adapters stay bf16) = up to ~1.26x if the kernel streams at
the XLA path's bandwidth fraction.

Writes docs/artifacts/weights_int8_pallas_ab.json.
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
    arms = {"bf16": params}
    for layout in ("xla", "pallas"):
        p = dict(params)
        p["decoder"] = gpt2.quantize_decoder_weights(params["decoder"],
                                                     layout=layout)
        arms["int8w" if layout == "xla" else "pallas"] = p

    modes = [("greedy", 1, 32), ("beam4", 4, 32)]
    if len(sys.argv) > 1 and sys.argv[1] == "--greedy-only":
        modes = modes[:1]

    out = {"tokens": TOKENS, "regions_per_report": REGIONS, "ab": {}}
    for mode, beams, batch in modes:
        rec = {f"{a}_s": [] for a in arms}
        rb = None
        for _ in range(3):
            for a, p in arms.items():
                s, rb = bench_decode(model, p, batch, beams)
                rec[f"{a}_s"].append(round(s, 4))
        best = {a: min(rec[f"{a}_s"]) for a in arms}
        steps = TOKENS - 2
        entry = {**rec, "r_budget": rb}
        for a, s in best.items():
            entry[f"{a}_rps"] = round(batch / s, 2)
            entry[f"{a}_ms_per_step"] = round(s / steps * 1e3, 2)
        entry["pallas_vs_bf16"] = round(best["bf16"] / best["pallas"], 3)
        entry["pallas_vs_int8w"] = round(best["int8w"] / best["pallas"], 3)
        out["ab"][f"{mode}_B{batch}"] = entry
        print(f"{mode} B{batch}: " + "  ".join(
            f"{a} {batch/s:.1f} r/s ({s/steps*1e3:.2f} ms/step)"
            for a, s in best.items()), file=sys.stderr)
        jax.clear_caches()

    print(json.dumps(out, indent=2))
    path = "docs/artifacts/weights_int8_pallas_ab.json"
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")


if __name__ == "__main__":
    main()
