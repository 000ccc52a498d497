"""Phase-controlled A/B: speculative vs synchronous classifier-driven serving.

The tunnel has fast/slow phases lasting minutes (CLAUDE.md), so the r3->r4
classifier-driven comparison must interleave both arms within ONE process:
arm S = synchronous split path (detect -> selection readback -> decode, the
round-3 behavior), arm P = speculative fused dispatch at the predicted
budget (round 4, serving.py speculative_decode). Each rep runs S then P on
the same images; best-of-N per arm.

Run on TPU: python scripts/bench_spec_ab.py [--batch 64] [--reps 4]
CPU smoke:  python scripts/bench_spec_ab.py --shallow --reps 1 --batch 2
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--n-batches", type=int, default=4)
    ap.add_argument("--max-length", type=int, default=60)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--shallow", action="store_true")
    ap.add_argument("--out", default="docs/artifacts/speculative_decode_ab.json")
    args = ap.parse_args()

    import jax

    if args.shallow:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/tests/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import bench as B
    from rgrg_tpu.inference import ReportGenerator
    from rgrg_tpu.serving import generate_reports_pipelined
    from rgrg_tpu.text.tokenizer import GPT2Tokenizer

    if args.shallow:
        from rgrg_tpu.core.config import (DecoderConfig, DetectorConfig,
                                          ModelConfig)
        from rgrg_tpu.models.full_model import RGRG
        cfg = ModelConfig(detector=DetectorConfig(backbone_stages=(1, 1, 1, 1)),
                          decoder=DecoderConfig(vocab_size=257, hidden_dim=32,
                                                num_heads=2, num_layers=2,
                                                bos_token_id=256,
                                                eos_token_id=256,
                                                pad_token_id=256))
        model = RGRG(cfg=cfg)
        params = model.init(jax.random.PRNGKey(0))
    else:
        model, params = B.build()
        model = B.calibrate_selection_threshold(model, params)
        _, model = B.certify_budget(model, params)

    gen = ReportGenerator.__new__(ReportGenerator)
    gen.model = model
    gen.params = params
    gen.tokenizer = GPT2Tokenizer.dummy()
    gen.similarity_fn = None
    gen.threshold = 0.9

    rng = np.random.default_rng(0)
    n_images = args.batch * args.n_batches
    raw = [rng.integers(0, 255, (700, 600)).astype(np.uint8)
           for _ in range(n_images)]

    def run(spec, subset):
        n = 0
        for reports in generate_reports_pipelined(
                gen, subset, batch_size=args.batch, num_beams=1,
                max_length=args.max_length, speculative_decode=spec):
            n += len(reports)
        return n

    # compile both arms' graphs before timing either
    run(False, raw[:args.batch])
    run(True, raw[:2 * args.batch])

    times = {"sync": [], "spec": []}
    for _ in range(args.reps):
        for name, spec in (("sync", False), ("spec", True)):
            t0 = time.perf_counter()
            n = run(spec, raw)
            times[name].append(time.perf_counter() - t0)
    out = {"config": {"batch": args.batch, "n_batches": args.n_batches,
                      "images": n_images, "max_length": args.max_length,
                      "platform": jax.devices()[0].platform,
                      "shallow": args.shallow}}
    for name in times:
        dt = min(times[name])
        out[name] = {"best_s": round(dt, 3),
                     "reports_per_sec": round(n_images / dt, 2),
                     "rep_times_s": [round(t, 3) for t in times[name]]}
    out["speedup"] = round(out["spec"]["reports_per_sec"]
                           / out["sync"]["reports_per_sec"], 3)
    print(json.dumps(out, indent=2))
    if args.out:
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2)
            f.write("\n")


if __name__ == "__main__":
    main()
