#!/usr/bin/env python
"""Test-set evaluation: detector / classifier / NLG / CE metrics over the
test split(s), writing final_scores.txt (reference test_set_evaluation.py).
"""

import argparse
import json
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--tokenizer-dir", required=True)
    ap.add_argument("--test-csv", required=True, nargs="+",
                    help="test.csv [test-2.csv]")
    ap.add_argument("--output", default="final_scores.txt")
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--num-beams", type=int, default=4)
    ap.add_argument("--max-length", type=int, default=300)
    ap.add_argument("--max-language-batches", type=int, default=100)
    ap.add_argument("--chexbert-checkpoint", default=None)
    ap.add_argument("--bert-vocab", default=None)
    ap.add_argument("--cider-df", default=None,
                    help="gzip doc-frequency cache from scripts/compute_cider_df.py")
    ap.add_argument("--artifacts-dir", default=None,
                    help="where sentence/report txt dumps + figures go "
                         "(default: alongside --output)")
    ap.add_argument("--num-figure-images", type=int, default=2,
                    help="bbox figures for the first N images (0 disables)")
    ap.add_argument("--workers", type=int, default=0,
                    help="sample-construction threads (DataLoader "
                         "num_workers analogue)")
    ap.add_argument("--prefetch", type=int, default=2,
                    help="batches prefetched ahead of the device step "
                         "(0 = synchronous)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from rgrg_tpu.data.dataset import RGRGDataset, read_split_csv
    from rgrg_tpu.eval.evaluator import evaluate_model
    from rgrg_tpu.inference import ReportGenerator
    from rgrg_tpu.models.full_model import RGRG
    from rgrg_tpu.text.tokenizer import GPT2Tokenizer

    if args.checkpoint.endswith((".pt", ".pth")):
        gen = ReportGenerator.from_torch_checkpoint(args.checkpoint,
                                                    args.tokenizer_dir)
    else:
        gen = ReportGenerator.from_orbax(args.checkpoint, args.tokenizer_dir)
    model, params, tok = gen.model, gen.params, gen.tokenizer

    chexbert = None
    if args.chexbert_checkpoint and args.bert_vocab:
        from rgrg_tpu.core.checkpoint import load_torch_checkpoint
        from rgrg_tpu.eval.chexbert import chexbert_label, convert_chexbert
        from rgrg_tpu.text.wordpiece import WordPieceTokenizer
        cx_params = jax.tree.map(jnp.asarray, convert_chexbert(
            load_torch_checkpoint(args.chexbert_checkpoint)))
        wp = WordPieceTokenizer.from_vocab_file(args.bert_vocab)

        def chexbert(reports):
            ids, mask = wp.encode_batch(reports)
            return chexbert_label(cx_params, jnp.asarray(ids),
                                  jnp.asarray(mask, jnp.float32))

    cider_df = cider_log_n = None
    if args.cider_df:
        from rgrg_tpu.data.stats import load_cider_doc_frequencies
        cider_df, cider_log_n = load_cider_doc_frequencies(args.cider_df)

    import os

    from rgrg_tpu.eval.artifacts import write_final_scores

    out_dir = args.artifacts_dir or os.path.dirname(os.path.abspath(args.output))
    all_scores = {}
    for csv_path in args.test_csv:
        ds = RGRGDataset(read_split_csv(csv_path), tok, train=False)
        tag = os.path.splitext(os.path.basename(csv_path))[0]
        batches = ds.batches(args.batch_size, workers=args.workers)
        if args.prefetch > 0:
            from rgrg_tpu.data.prefetch import prefetched
            batches = prefetched(batches, depth=args.prefetch)
        scores = evaluate_model(model, params, batches,
                                tok, num_beams=args.num_beams,
                                max_length=args.max_length,
                                max_language_batches=args.max_language_batches,
                                chexbert=chexbert,
                                artifacts_dir=os.path.join(out_dir, tag),
                                num_figure_images=args.num_figure_images,
                                cider_df=cider_df, cider_log_n=cider_log_n)
        all_scores[csv_path] = scores
        # reference final_scores.txt format (test_set_evaluation.py:77-177)
        write_final_scores(scores,
                           os.path.join(out_dir, f"final_scores_{tag}.txt"))

    with open(args.output, "w") as f:
        f.write(json.dumps(all_scores, indent=2, default=float))
    print(f"wrote {args.output} + artifacts under {out_dir}")


if __name__ == "__main__":
    main()
