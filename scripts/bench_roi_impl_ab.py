"""A/B the RoIAlign formulation inside the REAL product pipeline.

scripts/bench_roi_pooled.py measured the fused outer-product RoIAlign at
5.2x the separable 2-einsum in isolation (2.43 vs 12.57 ms per
B=24/N=256 chunk — the separable form's [B, N, P, W, C] HBM intermediate
is the cost). This script measures what that buys END TO END: the full
serving pipeline (bench.bench_product_path, raw uint8 -> report strings)
and a detect-only loop, both impls in ONE process / one tunnel phase
(CLAUDE.md: never compare across phases).

Writes docs/artifacts/roi_impl_ab.json.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import bench as B
    from rgrg_tpu.models.full_model import RGRG

    model, params = B.build()          # auto impl == fused (bf16 serving)
    budget, budgeted = B.certify_budget(model, params)

    def with_impl(m, impl):
        dcfg = dataclasses.replace(m.cfg.detector, roi_align_impl=impl)
        return RGRG(cfg=dataclasses.replace(m.cfg, detector=dcfg))

    images = jax.random.normal(jax.random.PRNGKey(1),
                               (B.PRODUCT_BATCH, 512, 512, 1),
                               jnp.float32) * 0.3
    images = images.astype(jnp.bfloat16)

    out = {"budget": budget, "batch": B.PRODUCT_BATCH, "variants": {}}
    impls = ("separable", "fused")
    models = {impl: with_impl(budgeted, impl) for impl in impls}

    # detect-only: chain iterations through a data dependence so the tunnel
    # roundtrip amortizes over the loop (one fetch at the end)
    for impl in impls:
        m = models[impl]

        def detect_loop(imgs, n=8):
            d = None
            for _ in range(n):
                d = m.detect(params, imgs)
                imgs = imgs + d["top_region_boxes"][0, 0, 0].astype(imgs.dtype) * 0
            return d["top_region_boxes"]
        jax.block_until_ready(detect_loop(images))
        det_times = []
        for rep in range(3):
            t0 = time.perf_counter()
            jax.device_get(detect_loop(images * (1.0 + 0.01 * (rep + 1))))
            det_times.append((time.perf_counter() - t0) / 8)
        out["variants"][impl] = {
            "detect_ms_b64": round(min(det_times) * 1e3, 2)}
        print(f"{impl}: detect {out['variants'][impl]['detect_ms_b64']} ms",
              file=sys.stderr)

    # product path, INTERLEAVED so a tunnel phase change hits both variants
    # equally: warm both pipelines first (repeats=1 is warmup + 1 run), then
    # alternate timed single runs and keep best-of per variant.
    for impl in impls:
        B.bench_product_path(models[impl], params, repeats=1)
    best = {impl: 0.0 for impl in impls}
    for _ in range(4):
        for impl in impls:
            rps = B.bench_product_path(models[impl], params, repeats=1)
            best[impl] = max(best[impl], rps)
    for impl in impls:
        out["variants"][impl]["product_reports_per_sec"] = round(best[impl], 2)
        print(f"{impl}: product {best[impl]:.1f} r/s", file=sys.stderr)

    sep, fus = out["variants"]["separable"], out["variants"]["fused"]
    out["fused_speedup_product"] = round(
        fus["product_reports_per_sec"] / sep["product_reports_per_sec"], 3)
    out["fused_speedup_detect"] = round(
        sep["detect_ms_b64"] / fus["detect_ms_b64"], 3)

    print(json.dumps(out, indent=2))
    path = "docs/artifacts/roi_impl_ab.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")


if __name__ == "__main__":
    main()
