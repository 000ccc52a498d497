"""Validate `inference_proposal_budget` against realistically-trained weights.

The serving knob (core/config.py RoIConfig.inference_proposal_budget) caps
the number of post-NMS proposals fed to the RoI head. With RANDOM weights
the cap is unsafe — objectness is noise, survivors fill post_nms_top_n
(1000), and truncation drops real regions. The reference has no such knob
(torchvision keeps all 1000, object_detector.py via RoIHeads); ours is a
serving-only optimization that must be validated on TRAINED weights, where
RPN objectness concentrates mass on a few hundred boxes.

This script manufactures that evidence without the (unavailable) published
checkpoint: it trains stage-1 on a synthetic 29-region corpus — bright
rectangles in a fixed anatomical-grid layout, jittered per sample, exactly
the detector's task shape — until the RPN separates objects from
background, then measures on held-out samples:

  1. post-NMS survivor counts (keep.sum()) per image,
  2. agreement of detections (top_region_boxes / class_detected /
     top_scores) between budget=None and budget in {600, 300, 150},
  3. the smallest power-of-two-ish budget with EXACT agreement.

Run: python scripts/validate_proposal_budget.py [--steps 150] [--batch 4]
(defaults sized for one v5e chip, ~10 min incl. compile). Writes a JSON
summary to stdout and (optionally) --out.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from rgrg_tpu.core.config import (DecoderConfig, DetectorConfig, ModelConfig,
                                  RoIConfig, TrainConfig)
from rgrg_tpu.models.full_model import RGRG
from rgrg_tpu.train import trainer as TR


def synth_batch(rng: np.random.Generator, batch: int, size: int = 512):
    """29 bright rectangles on a 6x5 grid, geometry jittered per sample.

    Mimics the detector's real task shape: every region present once, box
    sizes ~40-90 px, mild overlap, noisy background.
    """
    images = rng.normal(0.0, 0.15, (batch, size, size, 1)).astype(np.float32)
    boxes = np.zeros((batch, 29, 4), np.float32)
    for b in range(batch):
        for r in range(29):
            gy, gx = divmod(r, 6)
            cx = 45 + gx * 80 + rng.uniform(-12, 12)
            cy = 55 + gy * 95 + rng.uniform(-12, 12)
            w = rng.uniform(40, 90)
            h = rng.uniform(40, 90)
            x0 = float(np.clip(cx - w / 2, 0, size - 2))
            y0 = float(np.clip(cy - h / 2, 0, size - 2))
            x1 = float(np.clip(cx + w / 2, x0 + 4, size - 1))
            y1 = float(np.clip(cy + h / 2, y0 + 4, size - 1))
            boxes[b, r] = (x0, y0, x1, y1)
            # region-dependent intensity so the RoI classifier can tell them apart
            level = 0.6 + 0.4 * (r / 28.0)
            images[b, int(y0):int(y1), int(x0):int(x1), 0] += level
    return {
        "images": jnp.asarray(images),
        "gt_boxes": jnp.asarray(boxes),
        "gt_labels": jnp.asarray(np.tile(np.arange(1, 30), (batch, 1))),
        "gt_valid": jnp.ones((batch, 29), bool),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--eval-batches", type=int, default=4)
    ap.add_argument("--budgets", type=int, nargs="*", default=[600, 300, 150])
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--lr", type=float, default=1e-4,
                    help="stage-1 LR (default lower than the reference 1e-3: "
                         "small synthetic batches diverge at 1e-3)")
    ap.add_argument("--shallow", action="store_true",
                    help="shallow backbone + CPU (smoke test of this script)")
    ap.add_argument("--ckpt", default=None,
                    help="orbax checkpoint dir (e.g. the three-stage "
                         "rehearsal's stage2/last): certify ITS trained "
                         "detector instead of training one here")
    ap.add_argument("--time-detect", type=int, default=0, metavar="B",
                    help="also time detect at batch B: budget None vs the "
                         "smallest safe budget (quantifies the serving win)")
    ap.add_argument("--ladder", action="store_true",
                    help="additionally certify ladder_budget(survivors_max)"
                         " — the exact value bench.certify_budget would "
                         "serve for this checkpoint")
    args = ap.parse_args()

    if args.shallow:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/tests/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    # tiny decoder: stage-1 never touches it, keep init/memory negligible
    cfg = ModelConfig(
        detector=DetectorConfig(
            backbone_stages=(1, 1, 1, 1) if args.shallow else (3, 4, 6, 3)),
        decoder=DecoderConfig(
            vocab_size=64, hidden_dim=64, num_heads=2, num_layers=2,
            max_positions=64))
    model = RGRG(cfg=cfg)
    tcfg = TrainConfig(batch_size=args.batch, grad_accumulation_steps=1)

    rng = np.random.default_rng(0)
    if args.ckpt:
        from rgrg_tpu.core.checkpoint import load_checkpoint
        restored = load_checkpoint(args.ckpt)
        params = restored["params"] if "params" in restored else restored
        params = {"detector": jax.tree.map(jnp.asarray, params["detector"]),
                  # the decoder subtree is never touched by detect; keep the
                  # script's tiny random one so cfg and tree stay consistent
                  "decoder": model.init(jax.random.PRNGKey(0))["decoder"]}
        print(f"certifying trained detector from {args.ckpt}", file=sys.stderr)
    else:
        state, optimizer = TR.init_train_state(
            model, jax.random.PRNGKey(0), tcfg, stage=1, learning_rate=args.lr)
        step_fn = TR.make_train_step(model, tcfg, optimizer, stage=1)

        print(f"training stage-1 on synthetic 29-region corpus, "
              f"{args.steps} steps @ batch {args.batch}", file=sys.stderr)
        t0 = time.time()
        key = jax.random.PRNGKey(1)
        for i in range(args.steps):
            batch = synth_batch(rng, args.batch)
            key, sub = jax.random.split(key)
            state, losses = step_fn(state, batch, sub)
            if i % 25 == 0 or i == args.steps - 1:
                ls = {k: round(float(v), 4) for k, v in losses.items()}
                print(f"  step {i}: {ls} ({time.time()-t0:.0f}s)",
                      file=sys.stderr)
        params = state.params

    det = model.detector
    variables = params["detector"]

    # ---- survivor counts: how many post-NMS proposals actually survive ----
    @jax.jit
    def survivors(images):
        feats = det.apply(variables, images, method=det.backbone_features,
                          train=False)
        boxes, keep, _ = det.apply(variables, feats, train=False,
                                   method=det.rpn_proposals)
        return jnp.sum(keep, axis=1)

    # ---- budget-equivalence of the full detection output ----
    def model_with(budget):
        dcfg = dataclasses.replace(
            cfg.detector, roi=dataclasses.replace(
                cfg.detector.roi, inference_proposal_budget=budget))
        return RGRG(cfg=dataclasses.replace(cfg, detector=dcfg))

    def detect_with(budget, images):
        return model_with(budget).detect(params, images)

    if args.ladder:
        # pre-measure survivors on an independent draw and add the ladder
        # value certify_budget would pick (rule: budget >= survivors_max)
        from rgrg_tpu.models.full_model import ladder_budget
        rng_l = np.random.default_rng(12345)
        smax = max(int(np.asarray(survivors(
            synth_batch(rng_l, args.batch)["images"])).max())
            for _ in range(args.eval_batches))
        lb = ladder_budget(smax)
        if (lb < int(cfg.detector.rpn.post_nms_top_n_test)
                and lb not in args.budgets):
            print(f"ladder: survivors_max {smax} -> certifying budget {lb}",
                  file=sys.stderr)
            args.budgets.append(lb)

    counts, agreements = [], {b: {"boxes": [], "cls": []} for b in args.budgets}
    for _ in range(args.eval_batches):
        images = synth_batch(rng, args.batch)["images"]
        counts.extend(np.asarray(survivors(images)).tolist())
        ref = detect_with(None, images)
        for b in args.budgets:
            out = detect_with(b, images)
            agreements[b]["boxes"].append(float(jnp.max(jnp.abs(
                out["top_region_boxes"] - ref["top_region_boxes"]))))
            agreements[b]["cls"].append(bool(jnp.all(
                out["class_detected"] == ref["class_detected"])))

    summary = {
        ("ckpt" if args.ckpt else "steps"): args.ckpt or args.steps,
        "post_nms_capacity": int(cfg.detector.rpn.post_nms_top_n_test),
        "survivors_max": int(max(counts)),
        "survivors_mean": round(float(np.mean(counts)), 1),
        "budget_agreement": {
            str(b): {
                "max_box_delta_px": round(max(v["boxes"]), 4),
                "class_detected_identical": all(v["cls"]),
            } for b, v in agreements.items()
        },
    }
    safe = [b for b in sorted(args.budgets)
            if summary["budget_agreement"][str(b)]["class_detected_identical"]
            and summary["budget_agreement"][str(b)]["max_box_delta_px"] < 1e-3]
    summary["smallest_safe_budget_tested"] = safe[0] if safe else None

    if args.time_detect and safe:
        B = args.time_detect
        # axon microbench protocol (CLAUDE.md): identical repeat dispatches
        # can draw fake ~0 ms times — vary inputs per rep, force a small
        # scalar fetch each rep, and subtract one measured host<->device
        # roundtrip from the per-rep cost
        iters = 10
        reps = [synth_batch(rng, B)["images"] for _ in range(iters)]
        probe = jnp.zeros(())
        jax.device_get(probe)
        t0 = time.perf_counter()
        for _ in range(5):
            jax.device_get(probe)
        roundtrip_ms = (time.perf_counter() - t0) / 5 * 1e3
        timing = {"roundtrip_ms_subtracted": round(roundtrip_ms, 1)}
        for budget in (None, safe[0]):
            m = model_with(budget)
            m.detect(params, reps[0])["class_detected"].block_until_ready()
            t0 = time.perf_counter()
            for images in reps:
                # scalar fetch per rep: forces completion of THIS dispatch
                float(jnp.sum(m.detect(params, images)["class_detected"]))
            ms = ((time.perf_counter() - t0) / iters * 1e3) - roundtrip_ms
            timing["unbudgeted" if budget is None else f"budget_{budget}"] = \
                round(ms, 1)
        summary[f"detect_ms_at_B{B}"] = timing

    print(json.dumps(summary, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main()
