"""Microbench fc6 formulations on the real chip.

fc6 contracts the pooled [N, P, P, C] map with a [P*P*C, rep] kernel —
the detect pass's largest single op after the backbone (~8 ms per
256-proposal chunk at B=24 per the round-3 split, vs a ~0.7 ms
byte+FLOP roofline: 67 MB pooled + 268 MB weight at 819 GB/s, 69 GF at
197 TF/s). Three formulations:

  multiaxis — shipped (_Fc6): one dot_general contracting (P, P, C).
  slices64  — P*P unrolled 2-D dots pooled[:, i, j, :] @ k4[i, j],
              summed: every dot is a clean [N, C] x [C, rep] MXU matmul
              and every activation slice keeps C minor (no relayout).
  flatten   — pooled.reshape(N, -1) @ kernel: the known-bad variant
              (physical relayout of the pooled tensor, 9.5 ms/chunk).

MEASURED (v5e, docs/artifacts/fc6_formulations.json): multiaxis 0.615
ms/op — AT the byte roofline — vs slices64 0.892 and flatten 0.984.
The shipped formulation is already optimal in isolation; the ~8 ms
"fc6" share in the round-3 detect split is therefore in-context cost
(the layout the pooled-construct hands over + fusion boundaries), not
the contraction itself. Don't retry formulation swaps; any further
detect win must come from the pooled-construct producer side.

Timing protocol (CLAUDE.md): the tunnel serializes a ~27 ms roundtrip
with device compute, so each variant is timed as the SLOPE between a
jit running the op once and one running it R times on R pre-uploaded
DIFFERENT inputs (summed outputs, so nothing CSEs or DCEs) — the
roundtrip and dispatch overheads cancel in the difference. Inputs are
re-scaled every rep; best-of-reps.

Writes docs/artifacts/fc6_formulations.json.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_ROIS = 256
P = 8
C = 2048
REP = 1024
R = 9


def main():
    import jax
    import jax.numpy as jnp
    import bench as B

    B.wait_for_backend()

    rng = np.random.default_rng(0)
    kernel = jnp.asarray(rng.normal(0, 0.01, (P * P * C, REP)),
                         jnp.bfloat16)
    bias = jnp.asarray(rng.normal(0, 0.01, (REP,)), jnp.bfloat16)
    xs_host = rng.normal(0, 1, (R, N_ROIS, P, P, C)).astype(np.float32)

    def fc6_multiaxis(x, k):
        k4 = k.reshape(P, P, C, REP)
        y = jax.lax.dot_general(x, k4, (((1, 2, 3), (0, 1, 2)), ((), ())))
        return y + bias

    def fc6_slices64(x, k):
        k4 = k.reshape(P, P, C, REP)
        y = None
        for i in range(P):
            for j in range(P):
                d = jnp.dot(x[:, i, j, :], k4[i, j])
                y = d if y is None else y + d
        return y + bias

    def fc6_flatten(x, k):
        return x.reshape(x.shape[0], -1) @ k + bias

    variants = {"multiaxis": fc6_multiaxis, "slices64": fc6_slices64,
                "flatten": fc6_flatten}

    @functools.partial(jax.jit, static_argnames=("name", "n"))
    def run(xs, k, name, n):
        f = variants[name]
        acc = f(xs[0], k)
        for t in range(1, n):
            acc = acc + f(xs[t], k)
        return acc[0, :4].astype(jnp.float32)

    out = {"n_rois": N_ROIS, "p": P, "c": C, "rep": REP, "reps_in_jit": R,
           "variants": {}}
    # one 600 MB upload; per-rep input variation happens ON DEVICE (a
    # fresh scale per rep defeats the fake ~0 ms identical-dispatch
    # draws) and is blocked on BEFORE the timer so the tunnel transfer
    # never serializes into the timed dispatch.
    xs0 = jnp.asarray(xs_host, jnp.bfloat16)
    scale = jax.jit(lambda a, c: a * c)
    for name in variants:
        jax.block_until_ready(run(xs0, kernel, name, 1))     # compile both
        jax.block_until_ready(run(xs0, kernel, name, R))
        t1s, tRs = [], []
        for rep in range(4):
            xs = scale(xs0, jnp.bfloat16(1.0 + 0.01 * (rep + 1)))
            jax.block_until_ready(xs)
            # device_get forces a real host fetch (block_until_ready can
            # return early on axon); the extra roundtrip cancels in the
            # tR - t1 slope.
            t0 = time.time()
            jax.device_get(run(xs, kernel, name, 1))
            t1s.append(time.time() - t0)
            t0 = time.time()
            jax.device_get(run(xs, kernel, name, R))
            tRs.append(time.time() - t0)
            del xs
        per_op = (min(tRs) - min(t1s)) / (R - 1)
        out["variants"][name] = {
            "t1_s": [round(t, 4) for t in t1s],
            "tR_s": [round(t, 4) for t in tRs],
            "ms_per_op": round(per_op * 1e3, 3)}
        print(f"{name}: {per_op * 1e3:.2f} ms/op", file=sys.stderr)

    base = out["variants"]["multiaxis"]["ms_per_op"]
    for name, rec in out["variants"].items():
        rec["speedup_vs_multiaxis"] = round(base / rec["ms_per_op"], 3)

    print(json.dumps(out, indent=2))
    path = "docs/artifacts/fc6_formulations.json"
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")


if __name__ == "__main__":
    main()
