"""A/B the head-pair-packed beam KV cache (gpt2.cache_to_beam_layers
pack_pairs) on the real chip.

Motivation: the standard beam cache [H, BK, T, D=64] pads its trailing dim
to 128 lanes in TPU tiled layout — 2x the HBM bytes — which (a) is half the
"cache HBM->VMEM staging" floor identified by the r3 profile and (b) OOMs
v5e at B=64 (19 GiB padded vs 16 GiB HBM). Packing adjacent head pairs into
the lanes ([H/2, BK, T, 128]) removes the pad entirely; numerics are
identical (tests/test_beam.py::test_packed_kv_pairs_identical).

Protocol (CLAUDE.md): interleaved A/B within ONE process, best-of-N,
varied inputs per rep, one device_get per run.

  1. beam-4 decode at B=32 (the shipped BEAM_PRODUCT_BATCH), packed vs
     unpacked, via full_model.decode_selected;
  2. packed-only B=64 (unpacked OOMs — recorded as the structural result);
  3. beam-4 PRODUCT path at the winning config.

Writes docs/artifacts/beam_packed_ab.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


REGIONS = 6          # regions/report (bench.py REGIONS_PER_IMAGE)
TOKENS = 60          # bench.py SENT_TOKENS


def bench_decode(model, params, batch, packed, reps=4):
    """Seconds per decode_selected beam-4 call at `batch` reports."""
    import jax
    import jax.numpy as jnp
    from rgrg_tpu.decode import beam as beam_mod

    rng = np.random.default_rng(0)
    sel = np.zeros((batch, 29), bool)
    for i in range(batch):
        sel[i, rng.choice(29, REGIONS, replace=False)] = True
    sel = jnp.asarray(sel)
    r_budget = model.budget_for(batch * REGIONS, batch)

    # decode_selected's jit trace captured beam_generate at trace time —
    # the monkeypatch is invisible to a cached executable. Clear so each
    # config retraces (the remote compile server keeps warm recompiles
    # at ~20-50 s).
    jax.clear_caches()
    orig = beam_mod.beam_generate
    if packed:
        import functools
        beam_mod.beam_generate = functools.partial(orig, pack_kv_pairs=True)
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
    import jax.numpy as jnp  # noqa: F401  (backend init)
    import bench as B

    B.wait_for_backend()
    model, params = B.build()

    out = {"tokens": TOKENS, "regions_per_report": REGIONS, "ab": {}}

    # --- interleaved A/B at B=32 ---
    b32 = {"packed_s": [], "unpacked_s": []}
    for _ in range(3):
        s, rb = bench_decode(model, params, 32, packed=True)
        b32["packed_s"].append(round(s, 4))
        s, _ = bench_decode(model, params, 32, packed=False)
        b32["unpacked_s"].append(round(s, 4))
    p, u = min(b32["packed_s"]), min(b32["unpacked_s"])
    out["ab"]["B32"] = {**b32, "r_budget": rb,
                        "packed_rps": round(32 / p, 2),
                        "unpacked_rps": round(32 / u, 2),
                        "packed_speedup": round(u / p, 3)}
    print(f"B32: packed {32/p:.1f} r/s vs unpacked {32/u:.1f} r/s",
          file=sys.stderr)

    # --- B=64: unpacked OOMs (r3); try packed ---
    for packed in (True, False):
        key = f"B64_{'packed' if packed else 'unpacked'}"
        try:
            s, rb = bench_decode(model, params, 64, packed=packed)
            out["ab"][key] = {"s_per_call": round(s, 4), "r_budget": rb,
                              "rps": round(64 / s, 2)}
        except Exception as e:  # noqa: BLE001 — OOM IS the result
            out["ab"][key] = {"error": str(e)[:300]}
        print(f"{key}: {out['ab'][key]}", file=sys.stderr)

    print(json.dumps(out, indent=2))
    path = "docs/artifacts/beam_packed_ab.json"
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")


if __name__ == "__main__":
    main()
