"""Beam-4 occupancy probe: per-step cost vs row count, then the product
composition at bigger batches.

The r4 closure ("beam decode is occupancy-bound, not bandwidth-bound") rests
on one operating point (B=32, 192 rows). If it is right, per-step cost grows
SUBLINEARLY with rows — more rows amortize the small-dot plateau — and the
beam product batch should move past B=32 (packed B=64 already measured 28.3
vs 29.75 r/s decode-only, beam_packed_ab.json, but the PRODUCT composition
at B>=64 with chunked detect was never tried for beam).

Part A: packed-bf16 beam-4 decode_selected seconds/call and ms/step at row
counts {48, 96, 192, 384, 576, 768} (batch = rows/6 regions-per-report,
explicit r_budget = rows). OOM is recorded as the structural result.
Part B: the REAL serving pipeline (generate_reports_pipelined, beam-4,
early stopping) at B in {32, 64, 96c48, 128c64} — chunked detect where the
unchunked detector OOMs (B=128) or to bound HBM alongside the beam cache.

Protocol (CLAUDE.md): one process, jax.clear_caches() between configs,
varied inputs per rep, best-of-N, one device_get per run.

Writes docs/artifacts/beam_rows_curve.json. Reference product mode:
generate_reports_for_images.py:109-114 (num_beams=4, early_stopping=True).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REGIONS = 6   # regions/report (bench.py REGIONS_PER_IMAGE)
TOKENS = 60   # bench.py SENT_TOKENS


def bench_rows(model, params, rows, reps=4):
    """Seconds/call for packed-bf16 beam-4 decode_selected at exactly
    `rows` budget rows (batch = rows/REGIONS reports, all selected)."""
    import jax
    import jax.numpy as jnp

    batch = rows // REGIONS
    assert batch * REGIONS == rows
    rng = np.random.default_rng(0)
    sel = np.zeros((batch, 29), bool)
    for i in range(batch):
        sel[i, rng.choice(29, REGIONS, replace=False)] = True
    sel = jnp.asarray(sel)

    jax.clear_caches()

    def run(feats):
        out = model.decode_selected(
            params, feats, sel, rows, TOKENS, num_beams=4,
            early_stopping=True, kv_cache_dtype=jnp.bfloat16)
        return jax.device_get(out[0])[0, 0, :4]

    feats0 = jnp.asarray(
        rng.normal(0, 1, (batch, 29, 1024)).astype(np.float32))
    run(feats0)  # compile
    times = []
    for r in range(reps):
        t0 = time.time()
        run(feats0 * (1.0 + 0.01 * (r + 1)))
        times.append(time.time() - t0)
    return min(times), batch


def main():
    import jax.numpy as jnp  # noqa: F401  (backend init)
    import bench as B

    B.wait_for_backend()
    model, params = B.build()

    out = {"tokens": TOKENS, "regions_per_report": REGIONS,
           "canary_pre": B.tunnel_canary(), "rows_curve": {}, "product": {}}

    # --- Part A: rows curve, packed bf16 ---
    prev = None
    for rows in (48, 96, 192, 384, 576, 768):
        try:
            s, batch = bench_rows(model, params, rows)
            rec = {"s_per_call": round(s, 4),
                   "ms_per_step": round(s / TOKENS * 1e3, 3),
                   "batch": batch, "rps_decode": round(batch / s, 2)}
            if prev is not None:
                # cost ratio per 2x rows; 2.0 = linear, 1.0 = free rows
                rec["cost_ratio_vs_prev"] = round(s / prev, 3)
            prev = s
        except Exception as e:  # noqa: BLE001 — OOM IS the result
            rec = {"error": str(e)[:300]}
            prev = None
        out["rows_curve"][str(rows)] = rec
        print(f"rows={rows}: {rec}", file=sys.stderr)

    # --- Part B: product composition ---
    for batch, chunk in ((32, None), (64, None), (96, 48), (128, 64)):
        key = f"B{batch}" + (f"c{chunk}" if chunk else "")
        try:
            rps = B.bench_beam4_product(model, params, batch=batch,
                                        image_chunk=chunk)
            out["product"][key] = {"rps": round(rps, 2)}
        except Exception as e:  # noqa: BLE001
            out["product"][key] = {"error": str(e)[:300]}
        print(f"product {key}: {out['product'][key]}", file=sys.stderr)

    out["canary_post"] = B.tunnel_canary()
    print(json.dumps(out, indent=2))
    path = "docs/artifacts/beam_rows_curve.json"
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")


if __name__ == "__main__":
    main()
