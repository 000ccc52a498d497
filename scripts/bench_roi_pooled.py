"""Microbench RoIAlign pooled-construct formulations on the real chip.

Follow-up to scripts/bench_fc6.py: the fc6 contraction itself sits at its
byte roofline, so the remaining ~7 ms/chunk of the detect split lives in
the pooled-construct. The shipped separable 2-einsum
(ops/roi_align.roi_align_batched) materializes a [B, N, P, W, C]
intermediate in HBM between its einsums (~3.2 GB at B=24/N=256/bf16 —
write+read ≈ 7.8 ms at 819 GB/s, matching the observed cost). Variants:

  sep2    — shipped: vmap'd separable Ay @ F @ Ax^T (two einsums).
  fused   — ops/roi_align.roi_align_fused_batched: combined outer-product
            weights [B, N*64, 256] @ [B, 256, C] (one matmul, ~5x FLOPs,
            no HBM intermediate).
  pallas  — ops/roi_align_pallas.roi_align_pallas_batched: both
            contractions in VMEM (f32 output as shipped).

Timing protocol (CLAUDE.md / bench_fc6.py): slope between a jit running
the op once and one running it R times on R pre-uploaded DIFFERENT
feature tensors (summed output slices so nothing CSEs/DCEs); the ~27 ms
tunnel roundtrip and dispatch overhead cancel in the difference. Inputs
are re-scaled on device each rep; best-of-reps.

Writes docs/artifacts/roi_pooled_formulations.json.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

B = 24
N = 256
H = W = 16
C = 2048
R = 7


def main():
    import jax
    import jax.numpy as jnp
    import bench as BB
    from rgrg_tpu.ops.roi_align import (roi_align_batched,
                                        roi_align_fused_batched)
    from rgrg_tpu.ops.roi_align_pallas import roi_align_pallas_batched

    BB.wait_for_backend()

    rng = np.random.default_rng(0)
    feats_host = rng.normal(0, 1, (R, B, H, W, C)).astype(np.float32)
    x1 = rng.uniform(0, 480, (B, N)).astype(np.float32)
    y1 = rng.uniform(0, 480, (B, N)).astype(np.float32)
    boxes = jnp.asarray(np.stack(
        [x1, y1, x1 + rng.uniform(8, 500, (B, N)).astype(np.float32),
         y1 + rng.uniform(8, 500, (B, N)).astype(np.float32)], -1))

    variants = {
        "sep2": lambda f, bx: roi_align_batched(
            f, bx, compute_dtype=jnp.bfloat16),
        "fused": lambda f, bx: roi_align_fused_batched(
            f, bx, compute_dtype=jnp.bfloat16),
        "pallas": lambda f, bx: roi_align_pallas_batched(f, bx),
    }

    @functools.partial(jax.jit, static_argnames=("name", "n"))
    def run(xs, bx, name, n):
        f = variants[name]
        acc = jnp.zeros((4,), jnp.float32)
        for t in range(n):
            # acc feeds the next rep's input: the data dependence forces
            # sequential scheduling so each rep's pooled output is freed
            # before the next allocates (7 live f32 [24,256,8,8,2048]
            # outputs OOM'd the unchained pallas variant).
            out = f(xs[t] + acc[0].astype(xs.dtype) * 0, bx)
            acc = acc + out[0, 0, 0, 0, :4].astype(jnp.float32)
        return acc

    out = {"batch": B, "n_rois": N, "h": H, "c": C, "reps_in_jit": R,
           "variants": {}}
    xs0 = jnp.asarray(feats_host, jnp.bfloat16)
    scale = jax.jit(lambda a, c: a * c)
    for name in variants:
        try:
            jax.block_until_ready(run(xs0, boxes, name, 1))
            jax.block_until_ready(run(xs0, boxes, name, R))
        except Exception as e:  # keep other variants' data on OOM/compile fail
            out["variants"][name] = {"error": str(e)[:300]}
            print(f"{name}: FAILED {str(e)[:120]}", file=sys.stderr)
            continue
        t1s, tRs = [], []
        for rep in range(4):
            xs = scale(xs0, jnp.bfloat16(1.0 + 0.01 * (rep + 1)))
            jax.block_until_ready(xs)
            t0 = time.time()
            jax.device_get(run(xs, boxes, name, 1))
            t1s.append(time.time() - t0)
            t0 = time.time()
            jax.device_get(run(xs, boxes, name, R))
            tRs.append(time.time() - t0)
            del xs
        per_op = (min(tRs) - min(t1s)) / (R - 1)
        out["variants"][name] = {
            "t1_s": [round(t, 4) for t in t1s],
            "tR_s": [round(t, 4) for t in tRs],
            "ms_per_op": round(per_op * 1e3, 3)}
        print(f"{name}: {per_op * 1e3:.2f} ms/op", file=sys.stderr)

    base = out["variants"].get("sep2", {}).get("ms_per_op")
    if base:
        for rec in out["variants"].values():
            if "ms_per_op" in rec:
                rec["speedup_vs_sep2"] = round(base / rec["ms_per_op"], 3)

    print(json.dumps(out, indent=2))
    path = "docs/artifacts/roi_pooled_formulations.json"
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")


if __name__ == "__main__":
    main()
