"""B=128 detector HBM breakdown: which buffer is the wall, and can any
B=128 config beat B=64? (VERDICT r3 #7)

Analytic suspects at B=128 (bf16 compute):
  * pooled RoI features: [B, proposal_chunk, 8, 8, 2048] — at the default
    proposal_chunk=256 and budget 768 this is 8.6 GB at B=128 (the
    dominant buffer by an order of magnitude);
  * backbone C1/C2 activations: [B, 256, 256, 64] + [B, 128, 128, 256]
    ~ 1.07 GB each at B=128;
  * fc6 weights/activations: small next to both.

Levers: detect image_chunk (lax.map over image sub-batches: bounds BOTH
backbone activations and the pooled chunk's leading dim) and
RoIConfig.proposal_chunk (bounds the pooled chunk directly, at the cost of
more sequential fc6 dots). This script AOT-compiles model.detect for each
config and records temp_size_in_bytes (the compiled scratch requirement),
then runs the REAL product pipeline (bench_product_path) for the runnable
configs interleaved in ONE process (same tunnel phase), best-of-N.

Writes docs/artifacts/b128_hbm_breakdown.json.

Run on TPU: python scripts/bench_b128_hbm.py
AOT only:   python scripts/bench_b128_hbm.py --aot-only
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def with_roi_chunk(model, chunk):
    from rgrg_tpu.models.full_model import RGRG
    dcfg = dataclasses.replace(
        model.cfg.detector,
        roi=dataclasses.replace(model.cfg.detector.roi, proposal_chunk=chunk))
    return RGRG(cfg=dataclasses.replace(model.cfg, detector=dcfg))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--aot-only", action="store_true")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default="docs/artifacts/b128_hbm_breakdown.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import bench as B

    model, params = B.build()
    model = B.calibrate_selection_threshold(model, params)
    budget, served = B.certify_budget(model, params)

    # (name, batch, image_chunk, roi_chunk)
    configs = [
        ("B64_roi256", 64, None, 256),
        ("B128_roi256_unchunked", 128, None, 256),   # the r3 OOM case
        ("B128_c64_roi256", 128, 64, 256),           # the r3 runnable config
        ("B128_c64_roi128", 128, 64, 128),
        ("B128_roi64_unchunked", 128, None, 64),
        ("B128_c32_roi256", 128, 32, 256),
    ]

    out = {"certified_budget": budget, "aot": {}, "throughput": {},
           "analytic_gb": {}}
    roi_budget = budget or served.cfg.detector.rpn.post_nms_top_n_test
    for name, batch, ic, rc in configs:
        eff_b = min(ic or batch, batch)
        out["analytic_gb"][name] = {
            "pooled_chunk": round(eff_b * min(rc, roi_budget) * 8 * 8 * 2048
                                  * 2 / 1e9, 2),
            "backbone_c1": round(eff_b * 256 * 256 * 64 * 2 / 1e9, 2),
            "backbone_c2": round(eff_b * 128 * 128 * 256 * 2 / 1e9, 2),
        }

    for name, batch, ic, rc in configs:
        m = with_roi_chunk(served, rc) if rc != 256 else served
        # raw SOURCE-shaped uint8 (700x600, as bench_product_path feeds),
        # resized on device by the (wy, wx) mats for that source shape
        images = jnp.zeros((batch, 700, 600), jnp.uint8)
        from rgrg_tpu.ops.resize import resize_matrices
        wy_np, wx_np = resize_matrices(700, 600)
        wy, wx = jnp.asarray(wy_np), jnp.asarray(wx_np)
        t0 = time.time()
        try:
            # .lower on the bound method mis-binds self (jit methods bind
            # for calls, not for lower) — go through the class attribute
            compiled = type(m).detect.lower(m, params, images, (wy, wx),
                                            image_chunk=ic).compile()
            ma = compiled.memory_analysis()
            out["aot"][name] = {
                "temp_gib": round(ma.temp_size_in_bytes / 2**30, 2),
                "argument_gib": round(ma.argument_size_in_bytes / 2**30, 2),
                "compile_s": round(time.time() - t0, 1),
            }
        except Exception as e:  # noqa: BLE001 - OOM at compile IS the result
            out["aot"][name] = {"compile_error": str(e)[:300]}
        print(f"AOT {name}: {out['aot'][name]}", file=sys.stderr)

    if not args.aot_only:
        runnable = [(n, b, ic, rc) for n, b, ic, rc in configs
                    if "compile_error" not in out["aot"][n]]
        # interleave: one rep of each config per round, best-of-N
        best = {n: 0.0 for n, *_ in runnable}
        for n, batch, ic, rc in runnable:   # warmup/compile product graphs
            m = with_roi_chunk(served, rc) if rc != 256 else served
            B.bench_product_path(m, params, batch=batch, image_chunk=ic,
                                 repeats=1)
        for _ in range(args.reps):
            for n, batch, ic, rc in runnable:
                m = with_roi_chunk(served, rc) if rc != 256 else served
                rps = B.bench_product_path(m, params, batch=batch,
                                           image_chunk=ic, repeats=1)
                best[n] = max(best[n], rps)
        out["throughput"] = {n: round(v, 2) for n, v in best.items()}

    print(json.dumps(out, indent=2))
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")


if __name__ == "__main__":
    main()
