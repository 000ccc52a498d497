"""Weight-only int8 decoder serving (gpt2.quantize_decoder_weights).

Three pins:
1. exact plumbing — kernels constructed ON the int8 grid (integer
   multiples of one per-column scale whose absmax column hits 127)
   round-trip losslessly, so greedy decode over the quantized tree is
   token-for-token identical to the unquantized tree: any divergence is a
   plumbing bug, not quantization error.
2. quantization error bound — random kernels dequantize within s/2 per
   element and decode logits stay close at small scale.
3. serving knob — generate_reports_pipelined(weights_int8=True) produces
   reports, and with grid-exact weights, identical ones.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rgrg_tpu.core.config import DecoderConfig
from rgrg_tpu.models import gpt2


def _tiny_cfg():
    return DecoderConfig(
        vocab_size=97, hidden_dim=32, num_layers=2, num_heads=4,
        max_positions=40, image_feature_dim=16, bos_token_id=0,
        eos_token_id=1, pad_token_id=2)


def _snap_to_int8_grid(params):
    """Project every quantizable kernel onto its own int8 grid: quantize
    once, then rebuild the kernel as exactly q * s."""
    q = gpt2.quantize_decoder_weights(params)
    out = dict(params)
    for name, block in q.items():
        if not name.startswith("h_"):
            continue
        bp = {k: dict(v) if isinstance(v, dict) else v
              for k, v in params[name].items()}
        for grp_name, kernels in (("attn", ("c_attn", "c_proj")),
                                  ("mlp", ("c_fc", "c_proj"))):
            for kn in kernels:
                qd = block[grp_name][kn]
                exact = (qd["kernel"].astype(jnp.float32)
                         * qd["scale"][None, :])
                bp[grp_name] = dict(bp[grp_name])
                bp[grp_name][kn] = {
                    "kernel": exact.astype(params[name][grp_name][kn]
                                           ["kernel"].dtype),
                    "bias": qd["bias"]}
        out[name] = bp
    return out


def test_quantize_structure_and_error_bound():
    cfg = _tiny_cfg()
    params = gpt2.init_decoder_params(jax.random.PRNGKey(0), cfg)
    q = gpt2.quantize_decoder_weights(params)
    # untouched leaves
    assert q["wte"]["embedding"].dtype == params["wte"]["embedding"].dtype
    assert q["h_0"]["attn"]["uk"]["kernel"].dtype == jnp.float32
    for i in range(cfg.num_layers):
        for grp, kn in (("attn", "c_attn"), ("attn", "c_proj"),
                        ("mlp", "c_fc"), ("mlp", "c_proj")):
            qd = q[f"h_{i}"][grp][kn]
            w = np.asarray(params[f"h_{i}"][grp][kn]["kernel"], np.float32)
            assert qd["kernel"].dtype == jnp.int8
            assert qd["scale"].shape == (w.shape[1],)
            deq = np.asarray(qd["kernel"], np.float32) * np.asarray(
                qd["scale"])[None, :]
            # round-to-nearest: error <= s/2 (ties land exactly on s/2)
            bound = np.asarray(qd["scale"])[None, :] * 0.5001 + 1e-8
            assert (np.abs(deq - w) <= bound).all()


def test_grid_exact_weights_decode_token_identical():
    cfg = _tiny_cfg()
    rng = jax.random.PRNGKey(1)
    params = _snap_to_int8_grid(gpt2.init_decoder_params(rng, cfg))
    qparams = gpt2.quantize_decoder_weights(params)
    # sanity: the quantized tree reproduces the snapped kernels exactly
    for grp, kn in (("attn", "c_attn"), ("mlp", "c_fc")):
        deq = (qparams["h_0"][grp][kn]["kernel"].astype(jnp.float32)
               * qparams["h_0"][grp][kn]["scale"][None, :])
        np.testing.assert_allclose(
            np.asarray(deq), np.asarray(params["h_0"][grp][kn]["kernel"]),
            rtol=0, atol=1e-6)

    from rgrg_tpu.decode.greedy import greedy_generate
    feats = jax.random.normal(jax.random.PRNGKey(2), (6, cfg.image_feature_dim))
    ids_f = greedy_generate(params, feats, cfg, max_length=16)
    ids_q = greedy_generate(qparams, feats, cfg, max_length=16)
    np.testing.assert_array_equal(np.asarray(ids_f), np.asarray(ids_q))

    from rgrg_tpu.decode.beam import beam_generate
    ids_f = beam_generate(params, feats, cfg, max_length=12, num_beams=2)
    ids_q = beam_generate(qparams, feats, cfg, max_length=12, num_beams=2)
    np.testing.assert_array_equal(np.asarray(ids_f), np.asarray(ids_q))


def test_random_weights_logits_close():
    cfg = _tiny_cfg()
    params = gpt2.init_decoder_params(jax.random.PRNGKey(3), cfg)
    qparams = gpt2.quantize_decoder_weights(params)
    feats = jax.random.normal(jax.random.PRNGKey(4), (4, cfg.image_feature_dim))
    logits_f, _ = gpt2.prefill(params, feats, cfg.bos_token_id, 20, cfg)
    logits_q, _ = gpt2.prefill(qparams, feats, cfg.bos_token_id, 20, cfg)
    # int8 error per matmul ~0.4% relative; tiny model, loose bound
    err = np.abs(np.asarray(logits_f) - np.asarray(logits_q))
    scale = np.abs(np.asarray(logits_f)).mean() + 1e-6
    assert err.max() / scale < 0.15, (err.max(), scale)


def test_serving_knob_weights_int8(tmp_path):
    """weights_int8=True serves end-to-end; with the decoder kernels
    snapped onto their int8 grid first, reports are IDENTICAL to the
    unquantized pipeline (lossless round-trip through the knob)."""
    import cv2
    from rgrg_tpu.inference import ReportGenerator
    from rgrg_tpu.models.full_model import RGRG
    from rgrg_tpu.serving import generate_reports_pipelined
    from rgrg_tpu.text.tokenizer import GPT2Tokenizer
    from tests.test_full_model import SMOKE_CFG

    model = RGRG(cfg=SMOKE_CFG)
    params = model.init(jax.random.PRNGKey(0))
    params["decoder"] = _snap_to_int8_grid(params["decoder"])
    gen = ReportGenerator(params, GPT2Tokenizer.dummy(), cfg=SMOKE_CFG)
    paths = []
    for i in range(4):
        p = str(tmp_path / f"i{i}.png")
        cv2.imwrite(p, np.random.default_rng(i).uniform(
            0, 255, (96, 80)).astype(np.uint8))
        paths.append(p)
    kwargs = dict(batch_size=2, num_beams=1, max_length=6,
                  kv_cache_dtype=None)
    base = [r for c in generate_reports_pipelined(gen, paths, **kwargs)
            for r in c]
    quant = [r for c in generate_reports_pipelined(
        gen, paths, weights_int8=True, **kwargs) for r in c]
    assert len(base) == len(quant) == 4
    for a, b in zip(base, quant):
        assert a.report == b.report
        np.testing.assert_array_equal(a.selected_regions, b.selected_regions)


# ---------------------------------------------------------------------------
# Pallas-consumed int8 layout (ops/dense_wint8_pallas.py)
# ---------------------------------------------------------------------------

def test_dense_wint8_kernel_matches_oracle():
    """The Pallas kernel (interpret mode on CPU) reproduces the XLA dequant
    formulation at shapes that tile, with and without bias, and through
    leading batch dims; non-tiling shapes take the fallback and agree too."""
    from rgrg_tpu.ops.dense_wint8_pallas import dense_wint8

    rng = np.random.default_rng(0)

    def oracle(x, q, s, b):
        acc = x.astype(np.float32) @ q.astype(np.float32)
        acc = acc * s.reshape(1, -1)
        if b is not None:
            acc = acc + b.reshape(1, -1)
        return acc

    for m, k, n, lead in ((16, 128, 512, ()), (8, 256, 1024, ()),
                          (16, 128, 512, (4,)),  # leading batch dim
                          (5, 96, 100, ())):     # non-tiling -> fallback
        x = rng.normal(size=lead + (m, k)).astype(np.float32)
        q = rng.integers(-127, 128, size=(k, n)).astype(np.int8)
        s = rng.uniform(0.01, 0.1, size=(1, n)).astype(np.float32)
        b = rng.normal(size=(n,)).astype(np.float32)
        for bias in (b, None):
            got = np.asarray(dense_wint8(jnp.asarray(x), jnp.asarray(q),
                                         jnp.asarray(s),
                                         None if bias is None
                                         else jnp.asarray(bias)))
            want = oracle(x.reshape(-1, k), q, s, bias).reshape(
                lead + (m, n))
            np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-4)


def test_pallas_layout_decode_token_identical():
    """Grid-exact weights through layout="pallas" decode token-for-token
    identically to the unquantized tree (greedy and beam) — same pin as the
    XLA layout."""
    cfg = _tiny_cfg()
    params = _snap_to_int8_grid(
        gpt2.init_decoder_params(jax.random.PRNGKey(5), cfg))
    qparams = gpt2.quantize_decoder_weights(params, layout="pallas")
    assert qparams["h_0"]["attn"]["c_attn"]["kernel_q"].dtype == jnp.int8
    assert qparams["h_0"]["attn"]["c_attn"]["scale"].shape == (1, 3 * 32)

    from rgrg_tpu.decode.greedy import greedy_generate
    feats = jax.random.normal(jax.random.PRNGKey(6),
                              (4, cfg.image_feature_dim))
    ids_f = greedy_generate(params, feats, cfg, max_length=16)
    ids_q = greedy_generate(qparams, feats, cfg, max_length=16)
    np.testing.assert_array_equal(np.asarray(ids_f), np.asarray(ids_q))

    from rgrg_tpu.decode.beam import beam_generate
    ids_f = beam_generate(params, feats, cfg, max_length=12, num_beams=2)
    ids_q = beam_generate(qparams, feats, cfg, max_length=12, num_beams=2)
    np.testing.assert_array_equal(np.asarray(ids_f), np.asarray(ids_q))


def test_serving_knob_weights_int8_pallas(tmp_path):
    """weights_int8="pallas" serves end-to-end and, with grid-exact
    kernels, produces reports identical to the unquantized pipeline."""
    import cv2
    from rgrg_tpu.inference import ReportGenerator
    from rgrg_tpu.serving import generate_reports_pipelined
    from rgrg_tpu.models.full_model import RGRG
    from rgrg_tpu.text.tokenizer import GPT2Tokenizer
    from tests.test_full_model import SMOKE_CFG

    model = RGRG(cfg=SMOKE_CFG)
    params = model.init(jax.random.PRNGKey(0))
    params["decoder"] = _snap_to_int8_grid(params["decoder"])
    gen = ReportGenerator(params, GPT2Tokenizer.dummy(), cfg=SMOKE_CFG)
    paths = []
    for i in range(2):
        p = str(tmp_path / f"i{i}.png")
        cv2.imwrite(p, np.random.default_rng(i).uniform(
            0, 255, (96, 80)).astype(np.uint8))
        paths.append(p)
    kwargs = dict(batch_size=2, num_beams=1, max_length=6,
                  kv_cache_dtype=None)
    base = [r for c in generate_reports_pipelined(gen, paths, **kwargs)
            for r in c]
    quant = [r for c in generate_reports_pipelined(
        gen, paths, weights_int8="pallas", **kwargs) for r in c]
    assert len(base) == len(quant) == 2
    for a, b in zip(base, quant):
        assert a.report == b.report


def test_serve_cli_weights_int8_flag():
    """scripts/serve.py exposes all three weight-int8 modes (ADVICE r4):
    bare flag selects the throughput-neutral XLA layout, an explicit
    value can pick the Pallas co-residency layout, default is off."""
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        "serve_cli", os.path.join(os.path.dirname(__file__), "..",
                                  "scripts", "serve.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    parser = mod.build_parser()
    base = ["--checkpoint", "c", "--tokenizer-dir", "t", "--image-dir", "i"]
    assert parser.parse_args(base).weights_int8 == "off"
    assert parser.parse_args(base + ["--weights-int8"]).weights_int8 == "xla"
    assert parser.parse_args(
        base + ["--weights-int8", "pallas"]).weights_int8 == "pallas"
