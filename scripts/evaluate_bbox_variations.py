#!/usr/bin/env python
"""Bbox-variation robustness evaluation (reference
evaluate_bbox_variations.py, paper §5.3): perturb gt boxes with increasing
position/scale/aspect-ratio noise, RoI-pool features directly from the
perturbed boxes, decode, and report sentence METEOR per noise level."""

import argparse
import json
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--tokenizer-dir", required=True)
    ap.add_argument("--csv", required=True, help="split csv with gt boxes + phrases")
    ap.add_argument("--mode", choices=["position", "scale", "aspect"],
                    default="position")
    ap.add_argument("--stds", type=float, nargs="+",
                    default=[round(0.1 * i, 1) for i in range(20)])
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--max-batches", type=int, default=25)
    ap.add_argument("--max-length", type=int, default=64)
    ap.add_argument("--output", default="bbox_variations.json")
    args = ap.parse_args()

    import itertools

    from rgrg_tpu.data.dataset import RGRGDataset, read_split_csv
    from rgrg_tpu.eval.evaluator import evaluate_bbox_variations
    from rgrg_tpu.inference import ReportGenerator

    if args.checkpoint.endswith((".pt", ".pth")):
        gen = ReportGenerator.from_torch_checkpoint(args.checkpoint,
                                                    args.tokenizer_dir)
    else:
        gen = ReportGenerator.from_orbax(args.checkpoint, args.tokenizer_dir)

    ds = RGRGDataset(read_split_csv(args.csv), gen.tokenizer, train=False)
    batches = list(itertools.islice(ds.batches(args.batch_size),
                                    args.max_batches))
    results = evaluate_bbox_variations(gen.model, gen.params, batches,
                                       gen.tokenizer, args.mode,
                                       stds=args.stds,
                                       max_length=args.max_length)
    with open(args.output, "w") as f:
        json.dump({"mode": args.mode, "meteor_by_std": results}, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
