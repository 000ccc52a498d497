#!/usr/bin/env python
"""Train RGRG-TPU: 3-stage protocol (reference README_TRAIN_TEST.md).

  stage 1: object detector alone
  stage 2: + binary classifiers (pretrain without LM)
  stage 3: full model (frozen GPT-2 base; uk/uv + feature transform train)

Example:
  python scripts/train.py --stage 3 --train-csv data/train.csv \
      --val-csv data/valid.csv --tokenizer-dir /path/tok --run-dir runs/r1
"""

import argparse
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--stage", type=int, default=3, choices=[1, 2, 3])
    ap.add_argument("--train-csv", required=True)
    ap.add_argument("--val-csv", default=None)
    ap.add_argument("--tokenizer-dir", default=None)
    ap.add_argument("--run-dir", required=True)
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--max-steps", type=int, default=None)
    ap.add_argument("--seq-len", type=int, default=64)
    ap.add_argument("--lm-budget", type=int, default=128)
    ap.add_argument("--resume-from", default=None)
    ap.add_argument("--init-from-torch", default=None,
                    help="warm-start from a converted reference .pt")
    ap.add_argument("--workers", type=int, default=0,
                    help="sample-construction threads (reference "
                         "DataLoader num_workers analogue)")
    ap.add_argument("--prefetch", type=int, default=2,
                    help="batches prefetched ahead of the device step "
                         "(0 = synchronous)")
    args = ap.parse_args()

    import jax
    import numpy as np

    from rgrg_tpu.core.config import RGRGConfig
    from rgrg_tpu.data.dataset import RGRGDataset, read_split_csv
    from rgrg_tpu.models.full_model import RGRG
    from rgrg_tpu.text.tokenizer import GPT2Tokenizer
    from rgrg_tpu.train.loop import train

    cfg = RGRGConfig()
    model = RGRG(cfg=cfg.model)
    batch_size = args.batch_size or cfg.train.batch_size

    init_params = None
    if args.init_from_torch:
        # warm-start from a converted reference checkpoint: stage-1 detector
        # .pt for stage 2, full-model .pt for stage 3 (the reference loads
        # the best stage-(N-1) weights the same way, README_TRAIN_TEST.md)
        from rgrg_tpu.core.checkpoint import (convert_detector_checkpoint,
                                              convert_full_checkpoint,
                                              load_torch_checkpoint)
        sd = load_torch_checkpoint(args.init_from_torch)
        if any(k.startswith("object_detector.") for k in sd):
            init_params = convert_full_checkpoint(sd)
        else:
            init_params = {"detector": convert_detector_checkpoint(sd)}

    tok = GPT2Tokenizer.from_dir(args.tokenizer_dir) if args.tokenizer_dir else None
    train_df = read_split_csv(args.train_csv)
    train_ds = RGRGDataset(train_df, tok, train=True, seq_len=args.seq_len)

    def train_batches():
        it = train_ds.batches(batch_size, shuffle=True, workers=args.workers)
        if args.prefetch > 0:
            from rgrg_tpu.data.prefetch import prefetched
            it = prefetched(it, depth=args.prefetch)
        return it

    val_fn = None
    if args.val_csv:
        val_df = read_split_csv(args.val_csv)
        val_ds = RGRGDataset(val_df, tok, train=False, seq_len=args.seq_len)

        from rgrg_tpu.eval.evaluator import evaluate_model, validation_losses

        def val_fn(state):
            # per-module val losses (reference val_losses_dict,
            # evaluate_model.py:285-527); the loop logs each as val/<module>
            # and drives the plateau scheduler with "total"
            out = validation_losses(model, state.params,
                                    val_ds.batches(batch_size), args.stage,
                                    cfg.train, args.lm_budget,
                                    max_batches=20)
            # language-generation metrics gate: only once the model produces
            # non-degenerate sentences (evaluate_model.py:549-554, >100k)
            if (tok is not None and args.stage >= 2
                    and int(state.step) >= cfg.train.lm_eval_min_steps):
                # cap the iterator itself: evaluate_model's
                # max_language_batches bounds only the generation loop, and
                # an uncapped iterator would still run detector inference
                # over the WHOLE validation split for metrics we discard
                import itertools
                lm = evaluate_model(model, state.params,
                                    itertools.islice(
                                        val_ds.batches(batch_size), 5),
                                    tok,
                                    max_language_batches=5, max_length=128)
                for k, v in lm.get("sentence", {}).items():
                    if isinstance(v, (int, float)):
                        out[f"lm_{k}"] = float(v)
                for k, v in lm.get("report", {}).items():
                    if isinstance(v, (int, float)):
                        out[f"lm_report_{k}"] = float(v)
            return out

    train(model, cfg, train_batches, args.run_dir, stage=args.stage,
          num_epochs=args.epochs, val_fn=val_fn, lm_budget=args.lm_budget,
          resume_from=args.resume_from, max_steps=args.max_steps,
          init_params=init_params)


if __name__ == "__main__":
    main()
