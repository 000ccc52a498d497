#!/usr/bin/env python
"""Dataset statistics (reference compute_stats_dataset.py /
compute_mean_std_dataset.py): split counts, pos_weight ratios, and
optionally streaming pixel mean/std."""

import argparse
import json
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--csv", required=True, nargs="+")
    ap.add_argument("--mean-std", action="store_true",
                    help="also stream pixel mean/std (slow)")
    args = ap.parse_args()

    from rgrg_tpu.data.dataset import read_split_csv
    from rgrg_tpu.data.stats import compute_mean_std, dataset_stats

    for path in args.csv:
        df = read_split_csv(path)
        stats = dataset_stats(df)
        if args.mean_std:
            mean, std = compute_mean_std(df["mimic_image_file_path"].tolist())
            stats.update({"pixel_mean": mean, "pixel_std": std})
        print(path, json.dumps(stats, indent=2))


if __name__ == "__main__":
    main()
