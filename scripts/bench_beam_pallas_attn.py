"""A/B the fused Pallas beam-attention kernel vs the XLA one-hot path on
the real chip (both over the head-pair-packed bf16 cache).

The beam plateau after packing is still cache staging + per-layer
materialization overhead; ops/beam_attn_pallas.py streams each
item-block's K/V slice through VMEM exactly once with scores, ancestry
masking, softmax and the context contraction fused. Speed-of-light at the
serving shape (B=32, 192 rows, K=4, T=61, 24 layers, bf16) is ~4.6 GB of
cache per step = 5.6 ms/step at v5e's 819 GB/s, vs ~18.6 ms/step measured
for the packed XLA path.

Protocol (CLAUDE.md): interleaved A/B within ONE process, best-of-N,
varied inputs per rep, one device_get per run.

Writes docs/artifacts/beam_pallas_attn_ab.json.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


REGIONS = 6
TOKENS = 60


def bench_decode(model, params, batch, pallas, reps=4):
    import jax
    import jax.numpy as jnp
    from rgrg_tpu.decode import beam as beam_mod
    from rgrg_tpu.models import full_model as fm

    rng = np.random.default_rng(0)
    sel = np.zeros((batch, 29), bool)
    for i in range(batch):
        sel[i, rng.choice(29, REGIONS, replace=False)] = True
    sel = jnp.asarray(sel)
    r_budget = model.budget_for(batch * REGIONS, batch)

    del fm  # decode_selected imports beam_generate lazily from beam_mod
    jax.clear_caches()
    orig = beam_mod.beam_generate
    # pallas: False for the XLA path, or an int item_block for the kernel
    beam_mod.beam_generate = functools.partial(orig, pallas_attn=pallas)
    try:
        def run(feats):
            out = model.decode_selected(
                params, feats, sel, r_budget, TOKENS, num_beams=4,
                early_stopping=True, kv_cache_dtype=jnp.bfloat16)
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
    finally:
        beam_mod.beam_generate = orig


def main():
    import jax.numpy as jnp  # noqa: F401
    import bench as B

    B.wait_for_backend()
    model, params = B.build()

    # variants interleaved within one process: the XLA one-hot path vs the
    # kernel at several item-block sizes (bigger blocks cut grid overhead,
    # waste flops/softmax lanes on cross-item pairs)
    variants = {"xla": False, "pallas_ib4": 4, "pallas_ib8": 8}
    out = {"tokens": TOKENS, "regions_per_report": REGIONS, "ab": {}}
    for batch in (32,):
        rec = {f"{name}_s": [] for name in variants}
        rb = None
        for _ in range(3):
            for name, pal in variants.items():
                s, rb = bench_decode(model, params, batch, pallas=pal)
                rec[f"{name}_s"].append(round(s, 4))
        steps = TOKENS - 2
        best = {name: min(rec[f"{name}_s"]) for name in variants}
        u = best["xla"]
        summary = {"r_budget": rb}
        for name, s in best.items():
            summary[f"{name}_rps"] = round(batch / s, 2)
            summary[f"{name}_ms_per_step"] = round(s / steps * 1e3, 2)
            if name != "xla":
                summary[f"{name}_speedup"] = round(u / s, 3)
        out["ab"][f"B{batch}"] = {**rec, **summary}
        print(f"B{batch}: " + "  ".join(
            f"{name} {batch/s:.1f} r/s ({s/steps*1e3:.1f} ms/step)"
            for name, s in best.items()), file=sys.stderr)

    print(json.dumps(out, indent=2))
    path = "docs/artifacts/beam_pallas_attn_ab.json"
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")


if __name__ == "__main__":
    main()
