#!/usr/bin/env python
"""Generate radiology reports for CXR images (the product entry point).

Unlike the reference (edit-the-source configuration,
generate_reports_for_images.py:170-199), everything is a CLI flag.

Example:
  python scripts/generate_reports.py \
      --checkpoint /path/full_model.pt --tokenizer-dir /path/gpt2-tokenizer \
      --images a.jpg b.jpg --output reports.txt --num-beams 4
"""

import argparse
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--checkpoint", required=True,
                    help=".pt (reference torch checkpoint) or orbax dir")
    ap.add_argument("--tokenizer-dir", required=True,
                    help="dir with GPT-2 vocab.json + merges.txt")
    ap.add_argument("--images", nargs="+", required=True)
    ap.add_argument("--output", default="generated_reports.txt")
    ap.add_argument("--num-beams", type=int, default=4)
    ap.add_argument("--max-length", type=int, default=300)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--no-early-stopping", action="store_true")
    args = ap.parse_args()

    from rgrg_tpu.inference import ReportGenerator, write_generated_reports_to_txt

    if args.checkpoint.endswith(".pt") or args.checkpoint.endswith(".pth"):
        gen = ReportGenerator.from_torch_checkpoint(args.checkpoint,
                                                    args.tokenizer_dir)
    else:
        gen = ReportGenerator.from_orbax(args.checkpoint, args.tokenizer_dir)

    reports = []
    for i in range(0, len(args.images), args.batch_size):
        chunk = args.images[i:i + args.batch_size]
        reports.extend(gen.generate_reports(
            chunk, num_beams=args.num_beams, max_length=args.max_length,
            early_stopping=not args.no_early_stopping))
        for path, rep in zip(chunk, reports[i:]):
            print(f"{path}:\n  {rep.report}\n")

    write_generated_reports_to_txt(args.images, reports, args.output)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
