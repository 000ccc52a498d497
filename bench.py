"""Throughput benchmark: full-report generation pipeline on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Workload (mirrors the reference product entry point
generate_reports_for_images.py, but batched — the reference runs 1 image at
a time): batch of 512x512 CXR images -> detector (ResNet-50 + RPN + NMS +
RoIAlign + RoI heads + classifier heads) -> greedy per-region sentence
decode with GPT-2 Medium pseudo-attention (KV-cached, static buffers).

Weights are random in round 1 (published checkpoints are not fetchable in
this environment), so sentences don't hit EOS naturally; we bound decode at
SENT_TOKENS=60 tokens/region — the reference's own sentence-length envelope
(~95% of region sentences are < 60 tokens, run_configurations.py:50-51) —
and charge REGIONS_PER_IMAGE=6 decoded regions per report (paper's average
selection count).
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from rgrg_tpu.core.config import DetectorConfig, ModelConfig
from rgrg_tpu.models.full_model import RGRG

BATCH = 24
REGIONS_PER_IMAGE = 6
SENT_TOKENS = 60
BASELINE_REPORTS_PER_SEC = 50.0  # BASELINE.json north star


def main():
    # serving config: bf16 compute in the detector (params stay f32; box
    # math stays f32), bf16 decoder params, int8 KV cache.
    # (use_fused_roi_fc6 wins 16% standalone but currently faults inside the
    # full detect graph on v5e — kept opt-in; see STATUS.md round-2 plan.)
    cfg = ModelConfig(detector=DetectorConfig(dtype="bfloat16"))
    model = RGRG(cfg=cfg)
    rng = jax.random.PRNGKey(0)
    params = model.init(rng)
    # decoder in bf16: decode is HBM-bandwidth-bound; halves weight traffic
    params["decoder"] = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params["decoder"])

    images = jax.random.normal(jax.random.PRNGKey(1),
                               (BATCH, 512, 512, 1), jnp.float32) * 0.3

    # deterministic selection pattern: 6 regions per image
    sel = np.zeros((BATCH, 29), bool)
    sel[:, :REGIONS_PER_IMAGE] = True
    sel = jnp.asarray(sel)
    r_budget = model.budget_for(BATCH * REGIONS_PER_IMAGE, BATCH)

    def run_once():
        det = model.detect(params, images)
        out, decoded = model.decode_selected(
            params, det["region_features"], sel, r_budget, SENT_TOKENS,
            kv_cache_dtype=jnp.int8)
        return out

    # warmup / compile
    run_once().block_until_ready()
    run_once().block_until_ready()

    profile_dir = None
    if "--profile" in sys.argv:
        from rgrg_tpu.utils.logging import trace
        profile_dir = "bench_trace"

    iters = 20
    t0 = time.perf_counter()
    if profile_dir:
        from rgrg_tpu.utils.logging import trace
        with trace(profile_dir):
            for _ in range(iters):
                out = run_once()
            out.block_until_ready()
    else:
        for _ in range(iters):
            out = run_once()
        out.block_until_ready()
    dt = (time.perf_counter() - t0) / iters

    reports_per_sec = BATCH / dt
    print(json.dumps({
        "metric": "full_reports_per_sec_per_chip_greedy",
        "value": round(reports_per_sec, 3),
        "unit": "reports/s",
        "vs_baseline": round(reports_per_sec / BASELINE_REPORTS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
