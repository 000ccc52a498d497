#!/usr/bin/env python
"""TPU dress rehearsal of the full test-set evaluation driver.

The training loop got a full-scale hardware rehearsal in round 4
(train_step_fullscale.json); this gives the L4/L6 EVAL integration the same
treatment: synthesize test.csv/test-2.csv (random grayscale images + boxes +
region phrases), a full-50257-vocab tokenizer dir, and a random-weight orbax
checkpoint at the product config, then run `scripts/evaluate.py` end-to-end
ON THE REAL CHIP at the reference's eval settings — beam-4, early stopping,
max_length=300 (evaluate_language_model.py:1184-1206,
test_set_evaluation.py:726) — and publish docs/artifacts/eval_rehearsal.json
with eval-loop reports/s, per-rung cascade closure telemetry, and the
bail-out decision.

Random weights emit no EOS, so no search closes at rung 1: this is exactly
the cascade's measured worst case (1.37x slower than a straight max_length
decode, beam_eval_cascade.json) and must trip the adaptive bail-out — the
rehearsal asserts it does.

Usage (from /root/repo, with the axon tunnel up):
    python scripts/eval_rehearsal.py [--workdir /tmp/eval_rehearsal]
        [--images 24 8] [--batch-size 8] [--max-language-batches 2]
        [--skip-setup]
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, ".")


def make_tokenizer_dir(path: str, vocab_size: int, eos_id: int) -> None:
    """A self-consistent GPT-2-format tokenizer dir at the FULL vocab size:
    byte-level tokens at ids 0..255, printable filler tokens up to the
    model's vocab so ANY sampled id decodes to clean ASCII, <|endoftext|>
    pinned at the config's eos id (50256). merges.txt is header-only
    (byte-level encoding suffices for synthetic references)."""
    from rgrg_tpu.text.tokenizer import ENDOFTEXT, _bytes_to_unicode
    os.makedirs(path, exist_ok=True)
    encoder = {tok: i for i, tok in enumerate(_bytes_to_unicode().values())}
    nxt = len(encoder)
    while nxt < vocab_size:
        if nxt == eos_id:
            encoder[ENDOFTEXT] = nxt
        else:
            encoder[f"tok{nxt}"] = nxt
        nxt += 1
    assert encoder.get(ENDOFTEXT) == eos_id
    with open(os.path.join(path, "vocab.json"), "w", encoding="utf-8") as f:
        json.dump(encoder, f)
    with open(os.path.join(path, "merges.txt"), "w", encoding="utf-8") as f:
        f.write("#version: 0.2\n")


def make_split_csv(path: str, image_dir: str, n: int, seed: int) -> None:
    """Synthetic split rows in the ETL output schema (reference
    create_dataset.py writes these columns; dataset.py:read_split_csv)."""
    import cv2
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(seed)
    os.makedirs(image_dir, exist_ok=True)
    phrases = ["The heart is normal in size.",
               "There is no focal consolidation.",
               "No pleural effusion is seen.",
               "The mediastinum is unremarkable."]
    rows = []
    for i in range(n):
        h, w = int(rng.integers(480, 700)), int(rng.integers(420, 640))
        img = rng.uniform(0, 255, (h, w)).astype(np.uint8)
        p = os.path.join(image_dir, f"img_{seed}_{i}.png")
        cv2.imwrite(p, img)
        k = int(rng.integers(3, 7))
        labels = sorted(rng.choice(29, size=k, replace=False) + 1)
        boxes = []
        for _ in range(k):
            x0 = int(rng.integers(0, w - 60))
            y0 = int(rng.integers(0, h - 60))
            boxes.append([x0, y0, x0 + int(rng.integers(40, w - x0)),
                          y0 + int(rng.integers(40, h - y0))])
        has = [bool(rng.random() < 0.5) for _ in range(29)]
        bbox_phrases = [phrases[j % len(phrases)] if has[j] else ""
                        for j in range(29)]
        rows.append({
            "mimic_image_file_path": p,
            "bbox_coordinates": str(boxes),
            "bbox_labels": str(list(map(int, labels))),
            "bbox_phrases": str(bbox_phrases),
            "bbox_phrase_exists": str(has),
            "bbox_is_abnormal": str([bool(rng.random() < 0.3)
                                     for _ in range(29)]),
            "reference_report": " ".join(p for p in bbox_phrases if p) or
                                phrases[0],
        })
    pd.DataFrame(rows).to_csv(path, index=False)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--workdir", default="/tmp/eval_rehearsal")
    ap.add_argument("--images", type=int, nargs=2, default=(24, 8),
                    help="rows in test.csv and test-2.csv")
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--num-beams", type=int, default=4)
    ap.add_argument("--max-length", type=int, default=300)
    ap.add_argument("--max-language-batches", type=int, default=2,
                    help="language batches per split (detector/classifier "
                         "metrics still run over ALL batches)")
    ap.add_argument("--skip-setup", action="store_true",
                    help="reuse an existing workdir (ckpt + csvs + tokenizer)")
    ap.add_argument("--setup-only", action="store_true",
                    help="synthesize inputs + checkpoint (CPU) and exit — "
                         "lets setup run during a tunnel outage")
    ap.add_argument("--artifact",
                    default="docs/artifacts/eval_rehearsal.json")
    args = ap.parse_args()

    wd = args.workdir
    tok_dir = os.path.join(wd, "tokenizer")
    ckpt_dir = os.path.join(wd, "ckpt")
    csvs = [os.path.join(wd, "test.csv"), os.path.join(wd, "test-2.csv")]

    from rgrg_tpu.core.config import ModelConfig
    cfg = ModelConfig()

    setup_done = (os.path.isdir(tok_dir) and os.path.isdir(ckpt_dir)
                  and all(os.path.exists(c) for c in csvs))
    if setup_done and not args.skip_setup:
        print(f"reusing existing setup under {wd}", flush=True)
    if not (args.skip_setup or setup_done):
        import jax

        # setup (image synth, tokenizer dir, random init + orbax save) needs
        # no TPU — force CPU so a tunnel outage can't block it; the driver
        # under test runs in its own process on the axon backend
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/tests/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

        from rgrg_tpu.core.checkpoint import save_checkpoint
        from rgrg_tpu.models.full_model import RGRG
        os.makedirs(wd, exist_ok=True)
        make_tokenizer_dir(tok_dir, cfg.decoder.vocab_size,
                           cfg.decoder.eos_token_id)
        for seed, (csv_path, n) in enumerate(zip(csvs, args.images)):
            make_split_csv(csv_path, os.path.join(wd, "images"), n, seed)
        print("initializing random product-config params "
              f"({cfg.decoder.num_layers}x{cfg.decoder.hidden_dim} decoder)",
              flush=True)
        model = RGRG(cfg=cfg)
        params = model.init(jax.random.PRNGKey(0))
        save_checkpoint(ckpt_dir, jax.tree.map(lambda x: jax.device_get(x),
                                               params))
        del params, model

    if args.setup_only:
        print(f"setup complete under {wd}")
        return

    # the driver under test, in its own process (exactly how a user runs it)
    out_json = os.path.join(wd, "scores.json")
    cmd = [sys.executable, "scripts/evaluate.py",
           "--checkpoint", ckpt_dir, "--tokenizer-dir", tok_dir,
           "--test-csv", *csvs, "--output", out_json,
           "--batch-size", str(args.batch_size),
           "--num-beams", str(args.num_beams),
           "--max-length", str(args.max_length),
           "--max-language-batches", str(args.max_language_batches),
           "--artifacts-dir", os.path.join(wd, "artifacts"),
           "--num-figure-images", "2", "--prefetch", "2"]
    print("running:", " ".join(cmd), flush=True)
    t0 = time.monotonic()
    r = subprocess.run(cmd, cwd="/root/repo")
    wall = time.monotonic() - t0
    if r.returncode:
        sys.exit(f"evaluate.py failed with {r.returncode}")

    with open(out_json) as f:
        scores = json.load(f)
    artifact = {
        "settings": {"batch_size": args.batch_size,
                     "num_beams": args.num_beams,
                     "max_length": args.max_length,
                     "max_language_batches": args.max_language_batches,
                     "images": list(args.images),
                     "weights": "random (no published checkpoint offline)"},
        "wall_seconds_total": round(wall, 1),
        "splits": {},
    }
    for csv_path, sc in scores.items():
        tag = os.path.splitext(os.path.basename(csv_path))[0]
        lg = sc.get("language_generation") or {}
        artifact["splits"][tag] = {
            "decode_seconds": lg.get("decode_seconds"),
            "loop_seconds": lg.get("loop_seconds"),
            "language_images": lg.get("language_images"),
            "reports_per_sec_decode": lg.get("reports_per_sec_decode"),
            "cascade": lg.get("cascade"),
        }
        fs = os.path.join(wd, "artifacts", f"final_scores_{tag}.txt")
        artifact["splits"][tag]["final_scores_written"] = os.path.exists(fs)
    # random weights close nothing at rung 1 -> the cascade's measured worst
    # case -> the bail-out MUST have engaged on whichever split decoded
    # enough batches to observe the closure rate
    casc = [s["cascade"] for s in artifact["splits"].values()
            if s["cascade"] and s["cascade"]["rows_selected"]]
    artifact["bailout_engaged_any_split"] = any(c["bailed_out"] for c in casc)
    os.makedirs(os.path.dirname(args.artifact), exist_ok=True)
    with open(args.artifact, "w") as f:
        json.dump(artifact, f, indent=2)
    print(json.dumps(artifact, indent=2))


if __name__ == "__main__":
    main()
