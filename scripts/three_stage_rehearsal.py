"""Dress-rehearse the reference's FULL 3-stage training protocol end to end.

The reference's core training story (run_configurations.py:11-28,
train_full_model.py:289-302, README_TRAIN_TEST.md):

  stage 1: object detector alone            -> checkpoint
  stage 2: detector + binary classifiers,
           warm-started from stage 1        -> checkpoint
  stage 3: full model incl. language model,
           warm-started from stage 2        -> checkpoint
  finally: evaluate the stage-3 checkpoint (beam-4 generation, NLG metrics,
           txt artifacts, figures).

The published MIMIC-CXR data/weights are unavailable offline, so the
rehearsal runs on a SYNTHETIC corpus with the real task shape: 29 bright
rectangles in the anatomical-grid layout (each with a region-dependent
intensity the classifier/decoder can key on), ~50% of regions carrying a
short byte-tokenized phrase ("the <tag> is normal/abnormal."), abnormal
regions biased brighter. Every stage runs through the REAL production path:
`train.loop.train` (orbax checkpoints, plateau scheduler, eval-mode
validation losses) with `warm_start_params` handoffs, then
`eval.evaluator.evaluate_model` with beam-4 + early stopping, sentence/
report txt artifacts and bbox figures.

Writes docs/artifacts/three_stage_rehearsal.json: per-stage first/last
losses, validation losses, wall times, and the final eval scores.

Run (TPU, ~30-60 min):   python scripts/three_stage_rehearsal.py
Smoke test (CPU, ~5 min): python scripts/three_stage_rehearsal.py --shallow \
    --stage1-steps 8 --stage2-steps 4 --stage3-steps 8 --batch 2
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


REGION_TAGS = [f"r{i}" for i in range(29)]


def build_corpus_batch(rng: np.random.Generator, batch: int, tokenizer,
                       seq_len: int = 40, size: int = 512,
                       with_text: bool = True):
    """One synthetic batch with the full stage-3 schema.

    Geometry matches scripts/validate_proposal_budget.py synth_batch (the
    detector's task shape); on top of it, each region gets:
      - region_has_sentence ~ Bernoulli(0.5),
      - region_is_abnormal ~ Bernoulli(0.2), abnormal regions drawn brighter
        (+0.35) so the feature actually carries the signal,
      - a deterministic phrase "the <tag> is normal." / "... is abnormal."
        byte-tokenized and eos-wrapped — a mapping from region identity +
        intensity to text that a small decoder can learn.
    """
    images = rng.normal(0.0, 0.15, (batch, size, size, 1)).astype(np.float32)
    boxes = np.zeros((batch, 29, 4), np.float32)
    has_sentence = rng.uniform(size=(batch, 29)) < 0.5
    is_abnormal = rng.uniform(size=(batch, 29)) < 0.2
    input_ids = np.full((batch, 29, seq_len), tokenizer.pad_token_id, np.int32)
    attention_mask = np.zeros((batch, 29, seq_len), np.float32)
    phrases = []
    reports = []
    for b in range(batch):
        row_phrases = []
        report_sents = []
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
            level = 0.6 + 0.4 * (r / 28.0) + (0.35 if is_abnormal[b, r] else 0.0)
            images[b, int(y0):int(y1), int(x0):int(x1), 0] += level
            state = "abnormal" if is_abnormal[b, r] else "normal"
            phrase = f"The {REGION_TAGS[r]} is {state}." if has_sentence[b, r] else ""
            row_phrases.append(phrase)
            if phrase:
                report_sents.append(phrase)
                toks = tokenizer.encode(phrase, add_special=True)[:seq_len]
                input_ids[b, r, :len(toks)] = toks
                attention_mask[b, r, :len(toks)] = 1.0
        phrases.append(row_phrases)
        reports.append(" ".join(report_sents))
    batch_dict = {
        "images": images,
        "gt_boxes": boxes,
        "gt_labels": np.tile(np.arange(1, 30, dtype=np.int32), (batch, 1)),
        "gt_valid": np.ones((batch, 29), bool),
        "region_has_sentence": has_sentence,
        "region_is_abnormal": is_abnormal,
        "input_ids": input_ids,
        "attention_mask": attention_mask,
    }
    if with_text:
        batch_dict["reference_phrases"] = phrases
        batch_dict["reference_reports"] = reports
    return batch_dict


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage1-steps", type=int, default=400)
    ap.add_argument("--stage2-steps", type=int, default=150)
    ap.add_argument("--stage3-steps", type=int, default=400)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seq-len", type=int, default=40)
    ap.add_argument("--lm-budget", type=int, default=128)
    ap.add_argument("--eval-batches", type=int, default=3)
    ap.add_argument("--run-dir", default="/tmp/three_stage")
    ap.add_argument("--out", default="docs/artifacts/three_stage_rehearsal.json")
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--shallow", action="store_true",
                    help="shallow backbone + tiny decoder + CPU (smoke test)")
    args = ap.parse_args()

    if args.shallow:
        import jax
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/tests/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax

    from rgrg_tpu.core.config import (DecoderConfig, DetectorConfig,
                                      GenerationConfig, MeshConfig,
                                      ModelConfig, RGRGConfig, TrainConfig)
    from rgrg_tpu.eval import evaluator as EV
    from rgrg_tpu.models.full_model import RGRG
    from rgrg_tpu.text.tokenizer import GPT2Tokenizer
    from rgrg_tpu.train import loop as train_loop

    tokenizer = GPT2Tokenizer.dummy()

    # Full-size detector; the decoder is a REDUCED GPT-2 (4 layers, d=256,
    # byte vocab) so the rehearsal fits one chip's compile/time budget —
    # the protocol under test (handoffs, losses, eval) is decoder-size
    # independent.
    if args.shallow:
        det_cfg = DetectorConfig(backbone_stages=(1, 1, 1, 1))
        dec_cfg = DecoderConfig(vocab_size=tokenizer.vocab_size, hidden_dim=32,
                                num_heads=2, num_layers=2, max_positions=64,
                                bos_token_id=tokenizer.bos_token_id,
                                eos_token_id=tokenizer.eos_token_id,
                                pad_token_id=tokenizer.pad_token_id)
    else:
        det_cfg = DetectorConfig()
        dec_cfg = DecoderConfig(vocab_size=tokenizer.vocab_size, hidden_dim=256,
                                num_heads=4, num_layers=4, max_positions=64,
                                bos_token_id=tokenizer.bos_token_id,
                                eos_token_id=tokenizer.eos_token_id,
                                pad_token_id=tokenizer.pad_token_id)
    mcfg = ModelConfig(detector=det_cfg, decoder=dec_cfg,
                       generation=GenerationConfig(max_length=args.seq_len))
    tcfg = TrainConfig(batch_size=args.batch, grad_accumulation_steps=1,
                       learning_rate=args.lr, detector_learning_rate=args.lr,
                       seed=0)
    cfg = RGRGConfig(model=mcfg, train=tcfg, mesh=MeshConfig(num_devices=1))
    model = RGRG(cfg=mcfg)

    data_rng = np.random.default_rng(0)
    val_rng = np.random.default_rng(10_000)
    val_batches = [build_corpus_batch(val_rng, args.batch, tokenizer,
                                      args.seq_len)
                   for _ in range(args.eval_batches)]

    def batches(n_steps):
        def factory():
            for _ in range(n_steps):
                yield build_corpus_batch(data_rng, args.batch, tokenizer,
                                         args.seq_len, with_text=False)
        return factory

    def val_fn_for(stage):
        def val_fn(state):
            params = jax.device_get(state.params)
            return EV.validation_losses(model, params, iter(val_batches),
                                        stage, tcfg, lm_budget=args.lm_budget,
                                        max_batches=1)
        return val_fn

    summary = {"config": {"stage1_steps": args.stage1_steps,
                          "stage2_steps": args.stage2_steps,
                          "stage3_steps": args.stage3_steps,
                          "batch": args.batch,
                          "decoder": {"layers": dec_cfg.num_layers,
                                      "hidden": dec_cfg.hidden_dim,
                                      "vocab": dec_cfg.vocab_size},
                          "backbone_stages": list(det_cfg.backbone_stages)},
               "stages": {}}

    def run_stage(stage, n_steps, init_params):
        t0 = time.time()
        run_dir = os.path.join(args.run_dir, f"stage{stage}")
        state = train_loop.train(
            model, cfg, batches(n_steps), run_dir, stage=stage,
            num_epochs=1, max_steps=None, lm_budget=args.lm_budget,
            val_fn=val_fn_for(stage), evaluate_every=max(n_steps // 2, 1),
            init_params=init_params)
        params = jax.device_get(state.params)
        val = EV.validation_losses(model, params, iter(val_batches), stage,
                                   tcfg, lm_budget=args.lm_budget,
                                   max_batches=1)
        summary["stages"][f"stage{stage}"] = {
            "steps": n_steps,
            "wall_seconds": round(time.time() - t0, 1),
            "final_val_losses": {k: round(v, 4) for k, v in val.items()},
            "checkpoint": os.path.join(run_dir, "last"),
        }
        print(f"stage {stage} done in {time.time()-t0:.0f}s: "
              f"{summary['stages'][f'stage{stage}']['final_val_losses']}",
              file=sys.stderr)
        return params

    # ---- the protocol ----
    p1 = run_stage(1, args.stage1_steps, init_params=None)
    p2 = run_stage(2, args.stage2_steps,
                   init_params={"detector": p1["detector"]})
    p3 = run_stage(3, args.stage3_steps, init_params=p2)

    # ---- final evaluation of the stage-3 checkpoint ----
    t0 = time.time()
    artifacts_dir = os.path.join(args.run_dir, "eval_artifacts")
    eval_out = EV.evaluate_model(
        model, p3, iter(val_batches), tokenizer=tokenizer,
        generate_language=True, num_beams=4, max_length=args.seq_len,
        early_stopping=True, similarity_fn=None,
        artifacts_dir=artifacts_dir, num_figure_images=2)
    summary["final_eval"] = {
        "wall_seconds": round(time.time() - t0, 1),
        "object_detector": {
            "avg_detections_per_image":
                eval_out["object_detector"]["avg_detections_per_image"],
            "avg_iou": eval_out["object_detector"]["avg_iou"],
        },
        "region_selection": eval_out["region_selection"],
        "region_abnormal": eval_out["region_abnormal"],
        "sentence": eval_out.get("sentence"),
        "report": eval_out.get("report"),
        "artifacts_dir": artifacts_dir,
        "artifacts": sorted(os.listdir(artifacts_dir))
        if os.path.isdir(artifacts_dir) else [],
    }

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=2, default=float)
    print(json.dumps(summary, indent=2, default=float))


if __name__ == "__main__":
    main()
