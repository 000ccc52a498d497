#!/usr/bin/env python
"""Build train/valid/test/test-2 csv splits from Chest ImaGenome +
MIMIC-CXR + MIMIC-CXR-JPG (reference src/dataset/create_dataset.py)."""

import argparse
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--chest-imagenome", required=True)
    ap.add_argument("--mimic-cxr", required=True)
    ap.add_argument("--mimic-cxr-jpg", required=True)
    ap.add_argument("--output-dir", required=True)
    ap.add_argument("--splits", nargs="+", default=["train", "valid", "test"])
    ap.add_argument("--max-rows", type=int, default=None,
                    help="small sample csvs for dry runs")
    args = ap.parse_args()

    from rgrg_tpu.data.etl import EtlPaths, build_split

    paths = EtlPaths(args.chest_imagenome, args.mimic_cxr,
                     args.mimic_cxr_jpg, args.output_dir)
    for split in args.splits:
        written = build_split(split, paths, max_rows=args.max_rows)
        print(f"{split}: wrote {written}")


if __name__ == "__main__":
    main()
