#!/usr/bin/env python
"""One-command real-weight parity certification (docs/PARITY.md steps 2-4).

Runs, in order, everything the BASELINE.json fidelity bar requires once the
published artifacts exist locally (this environment is offline, so the
script FAILS FAST with a precise list of what is missing and where to put
it — nothing silently degrades):

  1. convert  — load + convert the published torch checkpoint
                (rpn key rename, HF Conv1D layouts, wte-position quirk);
  2. greedy   — generate greedy (num_beams=1) reports for --images with
                f32 detector dtype + Precision.HIGHEST and diff them
                line-by-line against --reference-reports (the PyTorch
                backend's dump for the SAME images,
                reference generate_reports_for_images.py:107-126);
  3. metrics  — scripts/evaluate.py over --test-csv with CheXbert +
                CIDEr document frequencies, writing final_scores.txt to
                compare against BASELINE.md;
  4. certify  — scripts/compare_backends.py-style scoring of the two
                report dumps against each other (and --references if
                given).

Usage:
  python scripts/certify_parity.py --dry-run          # wiring check, no weights
  python scripts/certify_parity.py \
      --checkpoint full_model_checkpoint.pt --tokenizer-dir gpt2-tok/ \
      --images img1.jpg img2.jpg --reference-reports torch_reports.txt \
      [--test-csv test.csv --chexbert-checkpoint chexbert.pth \
       --bert-vocab bert-base-uncased-vocab.txt --cider-df df.bin.gz]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _missing(args):
    """Returns [(artifact, why, hint), ...] for every absent required input."""
    gaps = []

    def need(path, what, hint):
        if not path:
            gaps.append((what, "not provided", hint))
        elif not os.path.exists(path):
            gaps.append((what, f"path does not exist: {path}", hint))

    need(args.checkpoint, "--checkpoint (published full_model .pt)",
         "https://github.com/ttanida/rgrg 'full model checkpoint' link")
    need(args.tokenizer_dir, "--tokenizer-dir (GPT-2 vocab.json+merges.txt)",
         "healx/gpt-2-pubmed-medium tokenizer files")
    if not args.images:
        gaps.append(("--images", "not provided",
                     "a handful of MIMIC-CXR jpgs run through BOTH backends"))
    else:
        for p in args.images:
            if not os.path.exists(p):
                gaps.append((f"--images {p}", "path does not exist", ""))
    need(args.reference_reports, "--reference-reports",
         "greedy report dump from the PyTorch reference for the same images "
         "(python src/full_model/generate_reports_for_images.py, beam=1)")
    # metrics stage is optional; validate only what was passed
    for flag, path in (("--test-csv", args.test_csv),
                       ("--chexbert-checkpoint", args.chexbert_checkpoint),
                       ("--bert-vocab", args.bert_vocab),
                       ("--cider-df", args.cider_df)):
        if path and not os.path.exists(path):
            gaps.append((flag, f"path does not exist: {path}", ""))
    return gaps


def main():
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--tokenizer-dir", default=None)
    ap.add_argument("--images", nargs="*", default=None)
    ap.add_argument("--reference-reports", default=None,
                    help="torch-backend greedy report dump, one per line")
    ap.add_argument("--test-csv", default=None)
    ap.add_argument("--chexbert-checkpoint", default=None)
    ap.add_argument("--bert-vocab", default=None)
    ap.add_argument("--cider-df", default=None)
    ap.add_argument("--output-dir", default="parity_out")
    ap.add_argument("--dry-run", action="store_true",
                    help="validate wiring (imports + converters resolvable) "
                         "and report the artifact checklist; exit 0")
    args = ap.parse_args()

    # wiring check: everything the pipeline needs must import and resolve
    from rgrg_tpu.core.checkpoint import (convert_full_checkpoint,       # noqa: F401
                                          load_torch_checkpoint)         # noqa: F401
    from rgrg_tpu.inference import ReportGenerator
    from rgrg_tpu.eval import nlg

    gaps = _missing(args)
    if gaps:
        print("parity certification BLOCKED — missing artifacts:\n")
        for what, why, hint in gaps:
            print(f"  {what}: {why}")
            if hint:
                print(f"      -> {hint}")
        if args.dry_run:
            print("\n--dry-run: wiring OK (converters, generator, NLG stack "
                  "all import); rerun with the artifacts above to certify.")
            sys.exit(0)
        sys.exit(2)

    os.makedirs(args.output_dir, exist_ok=True)
    import jax

    # 1. convert (f32 detector + HIGHEST precision: the bit-parity config,
    #    docs/PARITY.md step 2)
    print("== step 1: convert checkpoint ==")
    gen = ReportGenerator.from_torch_checkpoint(args.checkpoint,
                                                args.tokenizer_dir)
    print("   converted OK")

    # 2. greedy generation + text diff
    print("== step 2: greedy generation ==")
    reports = []
    for i in range(0, len(args.images), 8):
        chunk = args.images[i:i + 8]
        reports.extend(r.report for r in gen.generate_reports(
            chunk, num_beams=1, precision=jax.lax.Precision.HIGHEST))
    tpu_dump = os.path.join(args.output_dir, "tpu_greedy_reports.txt")
    with open(tpu_dump, "w") as f:
        f.write("\n".join(reports) + "\n")
    ref = [line.rstrip("\n") for line in open(args.reference_reports)
           if line.strip()]
    if len(ref) != len(reports):
        print(f"   COUNT MISMATCH: {len(reports)} tpu vs {len(ref)} torch")
        sys.exit(1)
    mism = [(i, a, b) for i, (a, b) in enumerate(zip(reports, ref)) if a != b]
    print(f"   exact match {len(reports) - len(mism)}/{len(reports)}")
    for i, a, b in mism[:5]:
        print(f"   DIFF image {i}:\n     tpu:   {a}\n     torch: {b}")

    # 3. metrics (optional)
    scores = None
    if args.test_csv:
        print("== step 3: metric evaluation ==")
        import subprocess
        cmd = [sys.executable, os.path.join(os.path.dirname(__file__),
                                            "evaluate.py"),
               "--checkpoint", args.checkpoint,
               "--tokenizer-dir", args.tokenizer_dir,
               "--test-csv", args.test_csv,
               "--output", os.path.join(args.output_dir, "final_scores.txt")]
        for flag, val in (("--chexbert-checkpoint", args.chexbert_checkpoint),
                          ("--bert-vocab", args.bert_vocab),
                          ("--cider-df", args.cider_df)):
            if val:
                cmd += [flag, val]
        subprocess.run(cmd, check=True)

    # 4. backend-vs-backend NLG certification
    print("== step 4: cross-backend scoring ==")
    nlg_scores = nlg.compute_nlg_scores(["bleu", "rouge"], reports, ref)
    result = {
        "num_reports": len(reports),
        "exact_match": len(reports) - len(mism),
        "exact_match_rate": (len(reports) - len(mism)) / max(len(reports), 1),
        "tpu_vs_torch": nlg_scores,
        "tpu_dump": tpu_dump,
    }
    out = os.path.join(args.output_dir, "certification.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))
    ok = result["exact_match_rate"] == 1.0
    print(f"\nparity: {'CERTIFIED' if ok else 'FAILED (see diffs above)'}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
