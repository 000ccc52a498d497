"""Exercise the BERTScore soft-dedup scorer ON DEVICE (axon TPU backend).

The default soft-dedup path (eval/bertscore.default_scorer, wired into
inference.ReportGenerator) had only ever run on the CPU backend in tests —
the published distilbert-base-uncased weights are not fetchable offline, so
the bench environment degrades to exact-dedup-only. This smoke manufactures
a random-weight distilbert directory (the exact HF DistilBertModel
state_dict layout convert_distilbert expects + a tiny WordPiece vocab),
points $RGRG_DISTILBERT_DIR at it, and drives the scorer through the real
report-assembly path on the active backend, checking:

  * the scorer loads through default_scorer (env-var discovery path),
  * _embed/_pair_f1 compile and run on the device,
  * bucketed shapes are stable: repeated calls with same-bucket inputs do
    not recompile (asserted via jit cache stats),
  * assemble_report consumes it end to end.

Run on TPU: python scripts/bertscore_tpu_smoke.py
CPU check:  python scripts/bertscore_tpu_smoke.py --cpu
Writes docs/artifacts/bertscore_tpu_smoke.json when --out is given.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_random_distilbert_dir(path: str, hidden: int = 768, layers: int = 6,
                               intermediate: int = 3072, seed: int = 0) -> None:
    """Writes pytorch_model.bin (random weights, real distilbert shapes) and
    a small vocab.txt in HF layout, loadable by eval.bertscore.load_bertscorer."""
    import numpy as np
    import torch

    words = ["the", "lungs", "are", "clear", "heart", "size", "is", "normal",
             "no", "pleural", "effusion", "seen", "cardiac", "silhouette",
             "within", "limits", "acute", "abnormality", "##s", "##ing",
             "bony", "structures", "intact", "mediastinum", "unremarkable"]
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + words
    with open(os.path.join(path, "vocab.txt"), "w") as f:
        f.write("\n".join(vocab) + "\n")

    rng = np.random.default_rng(seed)

    def t(*shape):
        return torch.from_numpy(
            (rng.standard_normal(shape) * 0.02).astype(np.float32))

    sd = {
        "embeddings.word_embeddings.weight": t(len(vocab), hidden),
        "embeddings.position_embeddings.weight": t(512, hidden),
        "embeddings.LayerNorm.weight": torch.ones(hidden),
        "embeddings.LayerNorm.bias": torch.zeros(hidden),
    }
    for i in range(layers):
        p = f"transformer.layer.{i}"
        for name, shape in [
                (f"{p}.attention.q_lin", (hidden, hidden)),
                (f"{p}.attention.k_lin", (hidden, hidden)),
                (f"{p}.attention.v_lin", (hidden, hidden)),
                (f"{p}.attention.out_lin", (hidden, hidden)),
                (f"{p}.ffn.lin1", (intermediate, hidden)),
                (f"{p}.ffn.lin2", (hidden, intermediate))]:
            sd[f"{name}.weight"] = t(*shape)
            sd[f"{name}.bias"] = torch.zeros(shape[0])
        for ln in (f"{p}.sa_layer_norm", f"{p}.output_layer_norm"):
            sd[f"{ln}.weight"] = torch.ones(hidden)
            sd[f"{ln}.bias"] = torch.zeros(hidden)
    torch.save(sd, os.path.join(path, "pytorch_model.bin"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax

    import dataclasses

    with tempfile.TemporaryDirectory() as d:
        make_random_distilbert_dir(d)
        os.environ["RGRG_DISTILBERT_DIR"] = d

        from rgrg_tpu.eval import bertscore as BS
        from rgrg_tpu.text.report import assemble_report

        # small vocab: shrink the config to the manufactured table
        cfg = dataclasses.replace(BS.DISTILBERT_CONFIG, vocab_size=30)
        scorer = BS.default_scorer(cfg=cfg)
        assert scorer is not None, "default_scorer did not find the dir"
        backend = jax.devices()[0].platform

        sents = [
            "The lungs are clear.",
            "The lungs are clear of abnormality.",
            "Heart size is normal.",
            "No pleural effusion seen.",
            "The cardiac silhouette is within normal limits.",
            "Bony structures intact.",
        ]
        pairs = [(a, b) for i, a in enumerate(sents) for b in sents[i + 1:]]

        t0 = time.time()
        f1 = scorer(pairs)
        compile_s = time.time() - t0
        assert len(f1) == len(pairs)
        assert all(-1.0 <= v <= 1.0 + 1e-6 for v in f1), f1

        # same bucket -> no recompile (embed N<=8 pads to 8, pairs pad pow2)
        n_before = BS._embed._cache_size()
        t0 = time.time()
        f1b = scorer(pairs[: len(pairs) - 2])
        steady_s = time.time() - t0
        assert BS._embed._cache_size() == n_before, "unexpected recompile"

        # end-to-end through report assembly (threshold 0.9 like the product)
        report = assemble_report(sents, scorer,
                                 BS.BERTSCORE_SIMILARITY_THRESHOLD)
        assert isinstance(report, str) and report

        summary = {
            "backend": backend,
            "pairs": len(pairs),
            "first_call_seconds": round(compile_s, 2),
            "steady_call_seconds": round(steady_s, 3),
            "f1_range": [round(min(f1), 4), round(max(f1), 4)],
            "recompile_on_same_bucket": False,
            "report_sentences_kept": report.count(".") ,
        }
        print(json.dumps(summary, indent=2))
        if args.out:
            os.makedirs(os.path.dirname(args.out), exist_ok=True)
            with open(args.out, "w") as f:
                json.dump(summary, f, indent=2)
        del f1b


if __name__ == "__main__":
    main()
