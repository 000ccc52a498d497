"""A/B the head-pair-packed GREEDY KV cache (gpt2.init_cache pack_pairs)
on the real chip.

Motivation: the greedy cache [L, B, H, T, D=64] pads its trailing dim to
128 lanes in TPU tiled layout — 2x the HBM bytes — exactly like the beam
cache did before packing (docs/artifacts/beam_packed_ab.json: 1.60x).
Round 3 rejected the [B,T,H*D] lane-aligned layout because XLA's relayout
for the attention dots cost more than the padding saved; head-pair packing
([L, B, H/2, T, 128]) is a different design — it keeps the head-leading
dot structure (no relayout) and removes the pad. Numerics are identical
for f32/bf16 (tests/test_gpt2.py::test_greedy_packed_kv_identical; int8
packs with per-pair scales, tests/test_int8_cache.py).

RESULT (negative — greedy keeps the unpacked layout): "ab" = v1 with
per-half [*,T,2] scales (packed int8 0.36x: the trailing-2 scale dim pads
64x and its repeat-dequant materializes a full f32 cache copy per step);
"ab_v2_perpair_scales" = trailing-1 scales (packed int8 still 0.40x, bf16
packed 0.58x of unpacked int8). Greedy's one-row attention fuses well
unpacked; the packed step's zero-interleaved queries + context extraction
cost more than the 2x lane pad saves. Beam is the opposite
(docs/artifacts/beam_packed_ab.json: 1.60x) — its 4-row ancestry dots are
cache-staging-bound.

Protocol (CLAUDE.md): interleaved A/B within ONE process, best-of-N,
varied inputs per rep, one device_get per run.

  1. greedy decode at B=32 (192 rows — the shipped device-path config),
     int8 cache: packed vs unpacked;
  2. same at B=64 (384 rows — the product bucket);
  3. bf16 packed at B=32 (packed bf16 == unpacked-int8 bytes: does int8
     still pay once the pad is gone?).

Writes docs/artifacts/greedy_packed_ab.json.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


REGIONS = 6          # regions/report (bench.py REGIONS_PER_IMAGE)
TOKENS = 60          # bench.py SENT_TOKENS


def bench_decode(model, params, batch, packed, kv_dtype, reps=4):
    """Seconds per decode_selected greedy call at `batch` reports."""
    import jax
    import jax.numpy as jnp
    from rgrg_tpu.models import full_model as fm
    from rgrg_tpu.decode import greedy as greedy_mod

    rng = np.random.default_rng(0)
    sel = np.zeros((batch, 29), bool)
    for i in range(batch):
        sel[i, rng.choice(29, REGIONS, replace=False)] = True
    sel = jnp.asarray(sel)
    r_budget = model.budget_for(batch * REGIONS, batch)
    dt = {"int8": jnp.int8, "bf16": jnp.bfloat16}[kv_dtype]

    # decode_selected's jit trace captured greedy_generate at trace time —
    # clear so each config retraces (warm remote recompiles ~20-50 s).
    jax.clear_caches()
    orig = greedy_mod.greedy_generate
    patched = functools.partial(orig, pack_kv_pairs=packed)
    fm.greedy_generate = patched
    try:
        def run(feats):
            out = model.decode_selected(
                params, feats, sel, r_budget, TOKENS, num_beams=1,
                kv_cache_dtype=dt)
            return jax.device_get(out[0])[0, :4]

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
        fm.greedy_generate = orig


def main():
    import jax.numpy as jnp  # noqa: F401  (backend init)
    import bench as B

    B.wait_for_backend()
    model, params = B.build()

    path = "docs/artifacts/greedy_packed_ab.json"
    prior = {}
    if os.path.exists(path):
        with open(path) as f:
            prior = json.load(f)
    # keep earlier formulations' results (e.g. the v1 per-half-scale
    # negative) under their own key; this run records the current code
    key = "ab_v2_perpair_scales" if "ab" in prior else "ab"
    out = {**prior, "tokens": TOKENS, "regions_per_report": REGIONS, key: {}}
    out_ab = out[key]

    # --- interleaved A/B, int8 cache (the shipped config) ---
    for batch in (32, 64):
        rec = {"packed_s": [], "unpacked_s": []}
        for _ in range(3):
            s, rb = bench_decode(model, params, batch, True, "int8")
            rec["packed_s"].append(round(s, 4))
            s, _ = bench_decode(model, params, batch, False, "int8")
            rec["unpacked_s"].append(round(s, 4))
        p, u = min(rec["packed_s"]), min(rec["unpacked_s"])
        out_ab[f"B{batch}_int8"] = {
            **rec, "r_budget": rb,
            "packed_rps": round(batch / p, 2),
            "unpacked_rps": round(batch / u, 2),
            "packed_speedup": round(u / p, 3)}
        print(f"B{batch} int8: packed {batch/p:.1f} r/s vs "
              f"unpacked {batch/u:.1f} r/s", file=sys.stderr)

    # --- packed bf16 vs packed int8 at B=32 (same process, comparable) ---
    times = []
    for _ in range(3):
        s, _ = bench_decode(model, params, 32, True, "bf16")
        times.append(round(s, 4))
    out_ab["B32_bf16_packed"] = {"s": times,
                                    "rps": round(32 / min(times), 2)}
    print(f"B32 bf16 packed: {32/min(times):.1f} r/s", file=sys.stderr)

    print(json.dumps(out, indent=2))
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")


if __name__ == "__main__":
    main()
