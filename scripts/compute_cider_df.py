#!/usr/bin/env python
"""Precompute CIDEr-D document frequencies from the validation split's
reference reports (reference compute_cider_document_frequencies.py)."""

import argparse
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--valid-csv", required=True)
    ap.add_argument("--output", default="mimic-cxr-document-frequency.bin.gz")
    args = ap.parse_args()

    import pandas as pd

    from rgrg_tpu.data.stats import compute_cider_doc_frequencies

    df = pd.read_csv(args.valid_csv, usecols=["reference_report"])
    reports = df["reference_report"].dropna().tolist()
    compute_cider_doc_frequencies(reports, save_path=args.output)
    print(f"wrote {args.output} ({len(reports)} reports)")


if __name__ == "__main__":
    main()
