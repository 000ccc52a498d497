"""Full-scale stage-3 train step on real hardware: steps/s, tokens/s, HBM.

The reference's stage-3 trains GPT-2 Medium pseudo-attention adapters +
the ResNet-50 detector at per-device batch 16 with grad-accumulation x4
(effective 64) under fp16 AMP (train_full_model.py:127,172-238,
run_configurations.py:37-41). This benchmarks OUR equivalent at the SAME
scale on one TPU chip: 24-layer / 1024-dim / 50257-vocab decoder,
ResNet-50 backbone, frozen-base optimizer partition — the config that had
never executed on the chip before round 4.

TPU recipe (the defaults):
  - detector compute bf16 (DetectorConfig.dtype; flax compute dtype,
    f32 masters) — the AMP analog for the conv stack;
  - decoder mixed precision (trainer mixed_precision=True): bf16 cast
    inside the loss, f32 masters + f32 grads out of astype's transpose;
  - per-block remat of the decoder (gpt2.forward_full remat=True);
  - frozen-base stop_gradient (skips dW matmuls for the 355M frozen
    GPT-2 weights; updates are bitwise-unchanged — the optimizer's
    set_to_zero partition already discarded those grads).

Reports AOT memory analysis (argument/output/temp bytes from the compiled
executable), per-step wall times over pre-uploaded batches, steps/s,
images/s, LM tokens/s, and live device memory_stats when available.

Run on the TPU:  python scripts/bench_train_fullscale.py
CPU smoke:       python scripts/bench_train_fullscale.py --shallow --steps 2
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_batch(rng: np.random.Generator, batch: int, seq_len: int,
                vocab: int, size: int = 512):
    """Synthetic stage-3 batch with the real task geometry (29 anatomical
    rectangles, ~50% of regions carrying a sentence) and random token ids
    spread over the full vocab. Token STATISTICS (row count, lengths) match
    the reference envelope: sentences <60 tokens (run_configurations.py:50),
    ~1/3 of regions with phrases (dataset_stats.txt:8-9) — here 50% so the
    lm budget is exercised at its upper bound."""
    images = rng.normal(0.0, 0.15, (batch, size, size, 1)).astype(np.float32)
    boxes = np.zeros((batch, 29, 4), np.float32)
    has_sentence = rng.uniform(size=(batch, 29)) < 0.5
    is_abnormal = rng.uniform(size=(batch, 29)) < 0.2
    input_ids = np.zeros((batch, 29, seq_len), np.int32)
    attention_mask = np.zeros((batch, 29, seq_len), np.float32)
    for b in range(batch):
        for r in range(29):
            gy, gx = divmod(r, 6)
            cx = 45 + gx * 80 + rng.uniform(-12, 12)
            cy = 55 + gy * 95 + rng.uniform(-12, 12)
            w = rng.uniform(40, 90)
            h = rng.uniform(40, 90)
            x0 = float(np.clip(cx - w / 2, 0, size - 2))
            y0 = float(np.clip(cy - h / 2, 0, size - 2))
            x1 = float(np.clip(cx + w / 2, x0 + 4, size - 1))
            y1 = float(np.clip(cy + h / 2, y0 + 4, size - 1))
            boxes[b, r] = (x0, y0, x1, y1)
            level = 0.6 + 0.4 * (r / 28.0) + (0.35 if is_abnormal[b, r] else 0.0)
            images[b, int(y0):int(y1), int(x0):int(x1), 0] += level
            if has_sentence[b, r]:
                n = int(rng.integers(8, seq_len))
                input_ids[b, r, :n] = rng.integers(0, vocab, n)
                attention_mask[b, r, :n] = 1.0
    return {
        "images": images,
        "gt_boxes": boxes,
        "gt_labels": np.tile(np.arange(1, 30, dtype=np.int32), (batch, 1)),
        "gt_valid": np.ones((batch, 29), bool),
        "region_has_sentence": has_sentence,
        "region_is_abnormal": is_abnormal,
        "input_ids": input_ids,
        "attention_mask": attention_mask,
    }


def cost_analysis_dict(compiled, peak_tflops: float = 197.0):
    """Analytic FLOPs/bytes from the compiled executable -> MFU anchor.
    197 TFLOP/s = v5e bf16 MXU peak (public spec; bench.py uses the same
    constant). XLA's flop count is the compiled graph's, i.e. it already
    reflects remat recompute — the honest denominator for 'how busy is
    the MXU', slightly pessimistic as a model-FLOPs MFU."""
    try:
        c = compiled.cost_analysis()
        if isinstance(c, (list, tuple)):
            c = c[0]
        flops = float(c.get("flops", float("nan")))
        byts = float(c.get("bytes accessed", float("nan")))
        return {"flops_per_step": flops if flops == flops else None,
                "gflops_per_step": (round(flops / 1e9, 1)
                                    if flops == flops else None),
                "bytes_accessed": byts if byts == byts else None,
                "mxu_peak_tflops": peak_tflops}
    except Exception as e:  # noqa: BLE001 - backend may not support it
        return {"error": str(e)}


def mem_analysis_dict(compiled):
    try:
        m = compiled.memory_analysis()
    except Exception as e:  # noqa: BLE001 - backend may not support it
        return {"error": str(e)}
    out = {}
    for k in ("argument_size_in_bytes", "output_size_in_bytes",
              "temp_size_in_bytes", "alias_size_in_bytes",
              "generated_code_size_in_bytes"):
        v = getattr(m, k, None)
        if v is not None:
            out[k] = int(v)
    if "argument_size_in_bytes" in out and "temp_size_in_bytes" in out:
        total = (out["argument_size_in_bytes"] + out["output_size_in_bytes"]
                 + out["temp_size_in_bytes"] - out.get("alias_size_in_bytes", 0))
        out["approx_peak_gib"] = round(total / 2**30, 2)
    return out


def device_mem_stats():
    import jax
    try:
        ms = jax.devices()[0].memory_stats()
        if not ms:
            return {"error": "memory_stats unavailable on this backend"}
        return {k: int(v) for k, v in ms.items()
                if "bytes" in k or "size" in k}
    except Exception as e:  # noqa: BLE001
        return {"error": str(e)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--accum", type=int, default=4)
    ap.add_argument("--seq-len", type=int, default=64)
    ap.add_argument("--lm-budget", type=int, default=256)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--det-dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--no-mixed", action="store_true")
    ap.add_argument("--no-remat", action="store_true")
    ap.add_argument("--aot-extra", action="store_true",
                    help="also AOT-compile the no-remat variant and record "
                         "its memory analysis (no execution)")
    ap.add_argument("--stage3-only", action="store_true",
                    help="skip the stage-1/stage-2 step-cost sections")
    ap.add_argument("--no-ckpt-roundtrip", action="store_true",
                    help="skip the full-scale orbax save/restore + bitwise "
                         "one-step continuation check")
    ap.add_argument("--shallow", action="store_true",
                    help="tiny model on CPU (plumbing smoke)")
    ap.add_argument("--out", default="docs/artifacts/train_step_fullscale.json")
    args = ap.parse_args()

    import jax

    if args.shallow:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/tests/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from rgrg_tpu.core.config import (DecoderConfig, DetectorConfig,
                                      ModelConfig, TrainConfig)
    from rgrg_tpu.models.full_model import RGRG
    from rgrg_tpu.train import trainer as T

    if args.shallow:
        det_cfg = DetectorConfig(backbone_stages=(1, 1, 1, 1),
                                 dtype=args.det_dtype)
        dec_cfg = DecoderConfig(vocab_size=512, hidden_dim=64, num_heads=2,
                                num_layers=2)
    else:
        det_cfg = DetectorConfig(dtype=args.det_dtype)
        dec_cfg = DecoderConfig()   # GPT-2 Medium: 24 x 1024, vocab 50257
    mcfg = ModelConfig(detector=det_cfg, decoder=dec_cfg)
    model = RGRG(cfg=mcfg)
    tcfg = TrainConfig(batch_size=args.batch,
                       grad_accumulation_steps=args.accum)

    mixed = not args.no_mixed
    remat = not args.no_remat

    rng_np = np.random.default_rng(0)
    batches = [build_batch(rng_np, args.batch, args.seq_len,
                           dec_cfg.vocab_size)
               for _ in range(max(args.steps, 1))]
    # token accounting: the LM sees min(budget, valid rows) sequences/step
    valid_rows = [int((b["region_has_sentence"]).sum()) for b in batches]
    valid_tokens = [float((b["attention_mask"]
                           * b["region_has_sentence"][..., None]).sum())
                    for b in batches]

    t0 = time.time()
    state, opt = T.init_train_state(model, jax.random.PRNGKey(0), tcfg,
                                    stage=3)
    n_params = sum(int(np.prod(x.shape))
                   for x in jax.tree.leaves(state.params))
    mask = T.trainable_mask(state.params, 3)
    n_train = sum(int(np.prod(x.shape))
                  for x, t in zip(jax.tree.leaves(state.params),
                                  jax.tree.leaves(mask)) if t)
    print(f"init {time.time()-t0:.0f}s: {n_params/1e6:.0f}M params, "
          f"{n_train/1e6:.0f}M trainable", file=sys.stderr)

    step = T.make_train_step(model, tcfg, opt, stage=3,
                             lm_budget=args.lm_budget,
                             mixed_precision=mixed, remat_decoder=remat)

    rng = jax.random.PRNGKey(1)
    dev_batches = [jax.device_put(b) for b in batches]

    summary = {
        "config": {
            "batch": args.batch, "accum": args.accum,
            "seq_len": args.seq_len, "lm_budget": args.lm_budget,
            "decoder": {"layers": dec_cfg.num_layers,
                        "hidden": dec_cfg.hidden_dim,
                        "vocab": dec_cfg.vocab_size},
            "backbone_stages": list(det_cfg.backbone_stages),
            "det_dtype": args.det_dtype,
            "decoder_mixed_precision": mixed,
            "decoder_remat": remat,
            "params_millions": round(n_params / 1e6, 1),
            "trainable_millions": round(n_train / 1e6, 1),
        },
    }

    t0 = time.time()
    lowered = step.lower(state, dev_batches[0], rng)
    compiled = lowered.compile()
    summary["compile_seconds"] = round(time.time() - t0, 1)
    summary["memory_analysis"] = mem_analysis_dict(compiled)
    summary["cost_analysis"] = cost_analysis_dict(compiled)
    print(f"compiled in {summary['compile_seconds']}s: "
          f"{summary['memory_analysis']}", file=sys.stderr)

    if args.aot_extra:
        t0 = time.time()
        step_nr = T.make_train_step(model, tcfg, opt, stage=3,
                                    lm_budget=args.lm_budget,
                                    mixed_precision=mixed,
                                    remat_decoder=False)
        try:
            c2 = step_nr.lower(state, dev_batches[0], rng).compile()
            summary["memory_analysis_no_remat"] = mem_analysis_dict(c2)
        except Exception as e:  # noqa: BLE001 - OOM at compile is a result
            summary["memory_analysis_no_remat"] = {"compile_error": str(e)[:500]}
        summary["compile_seconds_no_remat"] = round(time.time() - t0, 1)
        print(f"no-remat AOT: {summary['memory_analysis_no_remat']}",
              file=sys.stderr)

    # warmup execution (first run pays dispatch setup)
    state, losses = compiled(state, dev_batches[0], rng)
    first_losses = {k: float(v) for k, v in losses.items()}
    assert all(np.isfinite(v) for v in first_losses.values()), first_losses

    times = []
    for k in range(args.steps):
        rng_k = jax.random.fold_in(rng, k)
        t0 = time.perf_counter()
        state, losses = compiled(state, dev_batches[k], rng_k)
        lt = float(losses["loss_total"])   # forces completion (one fetch)
        times.append(time.perf_counter() - t0)
        print(f"step {k}: {times[-1]:.3f}s loss_total={lt:.3f}",
              file=sys.stderr)
    assert np.isfinite(lt)

    dt = float(np.median(times))
    micro_sps = 1.0 / dt
    summary["steps"] = args.steps
    summary["step_times_s"] = [round(t, 3) for t in times]
    summary["median_step_s"] = round(dt, 3)
    summary["micro_steps_per_sec"] = round(micro_sps, 3)
    summary["optimizer_steps_per_sec"] = round(micro_sps / args.accum, 3)
    summary["images_per_sec"] = round(args.batch * micro_sps, 2)
    summary["effective_batch"] = args.batch * args.accum
    avg_rows = float(np.mean([min(v, args.lm_budget) for v in valid_rows]))
    summary["lm_rows_per_step_avg"] = round(avg_rows, 1)
    summary["lm_tokens_per_sec_valid"] = round(
        float(np.mean(valid_tokens)) * micro_sps, 0)
    summary["lm_tokens_per_sec_padded"] = round(
        args.lm_budget * args.seq_len * micro_sps, 0)
    summary["first_step_losses"] = {k: round(v, 4)
                                    for k, v in first_losses.items()}
    fl = summary["cost_analysis"].get("flops_per_step")
    if fl:
        summary["mfu"] = round(fl * micro_sps / 197.0e12, 4)
        summary["tflops_per_sec"] = round(fl * micro_sps / 1e12, 1)
    summary["device_memory_stats"] = device_mem_stats()
    summary["platform"] = jax.devices()[0].platform

    # ----- full-scale orbax save/restore + one-step bitwise continuation -----
    # The resume path had only tiny-config CPU tests; this exercises it once
    # at the 609M-param scale on the chip. Bitwise check via per-leaf uint64
    # sums of the bitcast state (params + opt_state) after one step from the
    # in-memory state vs one step from the restored checkpoint — holding two
    # full TrainStates through a 14 GiB step would OOM, the fingerprint
    # doesn't have to.
    if not args.no_ckpt_roundtrip:
        import shutil
        import tempfile

        import jax.numpy as jnp

        bits_dtype = {1: jnp.uint8, 2: jnp.uint16, 4: jnp.uint32,
                      8: jnp.uint64}

        def fingerprint(tree):
            # per-leaf bit-sum mod 2^32 (x64 is disabled): a single flipped
            # element changes the sum unless it exactly cancels — plenty to
            # certify "restored step == in-memory step" over 493 leaves
            def fp(x):
                bits = jax.lax.bitcast_convert_type(
                    x, bits_dtype[x.dtype.itemsize])
                return jnp.sum(bits.astype(jnp.uint32))
            return [int(v) for v in jax.device_get(
                [fp(x) for x in jax.tree.leaves(tree)])]

        ckpt_dir = tempfile.mkdtemp(prefix="fullscale_ckpt_")
        try:
            from rgrg_tpu.core.checkpoint import (load_checkpoint,
                                                  save_checkpoint)
            t0 = time.time()
            save_checkpoint(os.path.join(ckpt_dir, "state"), state)
            save_s = time.time() - t0
            rng_c = jax.random.fold_in(rng, 12345)
            state_a, losses_a = compiled(state, dev_batches[0], rng_c)
            fp_a = fingerprint(state_a)
            loss_a = float(losses_a["loss_total"])
            abstract = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state_a)
            del state_a, losses_a, state  # free HBM before the restore branch
            t0 = time.time()
            state_b = load_checkpoint(os.path.join(ckpt_dir, "state"),
                                      target=abstract)
            restore_s = time.time() - t0
            state_b, losses_b = compiled(state_b, dev_batches[0], rng_c)
            fp_b = fingerprint(state_b)
            loss_b = float(losses_b["loss_total"])
            state = state_b
            summary["checkpoint_roundtrip"] = {
                "save_seconds": round(save_s, 1),
                "restore_seconds": round(restore_s, 1),
                "state_leaves": len(fp_a),
                "bitwise_continuation": fp_a == fp_b,
                "loss_total_match": loss_a == loss_b,
            }
            assert fp_a == fp_b, "restored step diverged from in-memory step"
        finally:
            shutil.rmtree(ckpt_dir, ignore_errors=True)
        print(f"checkpoint roundtrip: {summary['checkpoint_roundtrip']}",
              file=sys.stderr)

    # ----- stage-1 / stage-2 step costs at the same scale -----
    # stage 1 = detector-only losses (reference batch 16,
    # training_script_object_detector.py:33-49); stage 2 = + binary
    # classifiers, no LM (full_model training without language,
    # README_TRAIN_TEST.md) — both through the SAME trainer entry point the
    # product uses (train/trainer.py make_train_step(stage=N)).
    if not args.stage3_only:
        del state, compiled, step
        for st in (1, 2):
            t0 = time.time()
            state_s, opt_s = T.init_train_state(
                model, jax.random.PRNGKey(st), tcfg, stage=st)
            step_s = T.make_train_step(model, tcfg, opt_s, stage=st,
                                       lm_budget=args.lm_budget,
                                       mixed_precision=mixed,
                                       remat_decoder=remat)
            compiled_s = step_s.lower(state_s, dev_batches[0], rng).compile()
            sec = {"compile_seconds": round(time.time() - t0, 1),
                   "memory_analysis": mem_analysis_dict(compiled_s),
                   "cost_analysis": cost_analysis_dict(compiled_s)}
            state_s, losses = compiled_s(state_s, dev_batches[0], rng)
            assert np.isfinite(float(losses["loss_total"]))
            ts = []
            for k in range(args.steps):
                rng_k = jax.random.fold_in(rng, 1000 + k)
                t0 = time.perf_counter()
                state_s, losses = compiled_s(state_s, dev_batches[k], rng_k)
                float(losses["loss_total"])
                ts.append(time.perf_counter() - t0)
            dts = float(np.median(ts))
            sec["median_step_s"] = round(dts, 3)
            sec["images_per_sec"] = round(args.batch / dts, 2)
            flc = sec["cost_analysis"].get("flops_per_step")
            if flc:
                sec["mfu"] = round(flc / dts / 197.0e12, 4)
            summary[f"stage{st}"] = sec
            print(f"stage {st}: {dts:.3f}s/step "
                  f"({sec['images_per_sec']} img/s)", file=sys.stderr)
            del state_s, compiled_s, step_s, opt_s

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=2)
        f.write("\n")
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
