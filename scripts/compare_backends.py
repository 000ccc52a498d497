#!/usr/bin/env python
"""Backend fidelity certification: score two report dumps (e.g. PyTorch
reference output vs rgrg_tpu output) against the same reference reports and
each other.

Inputs are plain text files with one report per line (or the
`generate_reports.py` txt format via --txt-format).
"""

import argparse
import json
import sys

sys.path.insert(0, ".")


def read_reports(path: str, txt_format: bool) -> list:
    if not txt_format:
        return [line.rstrip("\n") for line in open(path) if line.strip()]
    out = []
    for line in open(path):
        if line.startswith("Generated report: "):
            out.append(line[len("Generated report: "):].strip())
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--backend-a", required=True, help="report dump A")
    ap.add_argument("--backend-b", required=True, help="report dump B")
    ap.add_argument("--references", default=None,
                    help="reference reports (optional)")
    ap.add_argument("--txt-format", action="store_true")
    args = ap.parse_args()

    from rgrg_tpu.eval import nlg

    a = read_reports(args.backend_a, args.txt_format)
    b = read_reports(args.backend_b, args.txt_format)
    assert len(a) == len(b), f"count mismatch: {len(a)} vs {len(b)}"

    exact = sum(x == y for x, y in zip(a, b))
    result = {
        "num_reports": len(a),
        "exact_match": exact,
        "exact_match_rate": exact / max(len(a), 1),
        "a_vs_b": nlg.compute_nlg_scores(["bleu", "rouge"], a, b),
    }
    if args.references:
        refs = read_reports(args.references, args.txt_format)
        result["a_vs_ref"] = nlg.compute_nlg_scores(
            ["bleu", "meteor", "rouge", "cider"], a, refs)
        result["b_vs_ref"] = nlg.compute_nlg_scores(
            ["bleu", "meteor", "rouge", "cider"], b, refs)
    print(json.dumps(result, indent=2, default=float))


if __name__ == "__main__":
    main()
