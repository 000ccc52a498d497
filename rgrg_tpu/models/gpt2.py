"""GPT-2 Medium decoder with pseudo self-attention, pure-functional JAX.

Re-designs the reference LanguageModel (language_model.py:32-652):

  - "pseudo self-attention" (Encoder-Agnostic Adaptation, arXiv 1908.06938):
    every layer's K/V gets one extra leading slot holding a projection
    (uk/uv) of the image region feature; the causal mask never masks slot 0.
  - The KV cache is a STATIC [L, B, H, 1+T_max, D] buffer written in place
    with dynamic_update_slice — the reference reallocates per step
    (torch.cat, language_model.py:169-170); ours is while_loop-friendly and
    allocation-free.
  - GPT-2 weights are frozen in the reference; here that's an optimizer
    partition concern (train/, not a model concern) — the forward is the same.

Weight-compatibility notes (all verified by tests/test_gpt2.py):
  - c_attn/c_proj/c_fc are HF Conv1D layers: weights stored [in, out] — used
    as-is, NO transpose (unlike torch Linear).
  - positional embeddings are looked up in the WORD embedding table when
    cfg.positions_from_wte (reference quirk at language_model.py:307, baked
    into the published checkpoints).
  - lm_head is tied to wte (HF GPT2LMHeadModel).
  - attention: scale 1/sqrt(head_dim); causal fill -1e4; additive padding
    mask -1e4 * (1-mask) with an extra always-on column for the image slot.
    (The reference uses -1e4 for the causal fill and -10000.0 for the padding
    mask — the same number.)
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from rgrg_tpu.core.config import DecoderConfig

Params = Dict[str, Any]

MASK_VALUE = -1e4


def _dense(x: jnp.ndarray, p: Params, precision=None) -> jnp.ndarray:
    """y = x @ kernel + bias, kernel stored [in, out].

    Accepts weight-only-int8 kernels (quantize_decoder_weights): the
    int8 -> x.dtype convert fuses into the dot's operand read on TPU so
    the kernel's HBM traffic stays int8 (the same fusion the int8 KV
    cache rides); the per-output-channel scale is applied post-dot —
    (x @ q) * s == x @ (q * s) exactly.
    """
    if "kernel_q" in p:
        # Pallas-consumed int8 (quantize_decoder_weights layout="pallas"):
        # the dequant happens inside the kernel, in VMEM, so XLA cannot
        # hoist it out of the decode while_loop — per-step weight HBM
        # traffic stays int8 (ops/dense_wint8_pallas.py).
        from rgrg_tpu.ops.dense_wint8_pallas import dense_wint8
        return dense_wint8(x, p["kernel_q"], p["scale"], p["bias"],
                           precision=precision)
    k = p["kernel"]
    if k.dtype == jnp.int8:
        y = jnp.dot(x, k.astype(x.dtype), precision=precision)
        return (y * p["scale"] + p["bias"]).astype(y.dtype)
    return jnp.dot(x, k, precision=precision) + p["bias"]


def _layer_norm(x: jnp.ndarray, p: Params, eps: float) -> jnp.ndarray:
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _gelu_new(x: jnp.ndarray) -> jnp.ndarray:
    """HF 'gelu_new' == tanh-approximated GELU (GPT-2's activation)."""
    return jax.nn.gelu(x, approximate=True)


def _split_heads(x: jnp.ndarray, num_heads: int, head_dim: int) -> jnp.ndarray:
    """[..., S, H*D] -> [..., H, S, D]"""
    y = x.reshape(x.shape[:-1] + (num_heads, head_dim))
    return jnp.swapaxes(y, -3, -2)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    """[..., H, S, D] -> [..., S, H*D]"""
    y = jnp.swapaxes(x, -3, -2)
    return y.reshape(y.shape[:-2] + (-1,))


def quantize_decoder_weights(params: Params, layout: str = "xla") -> Params:
    """Weight-only symmetric per-output-channel int8 of the per-layer
    matmul kernels (attn c_attn/c_proj, mlp c_fc/c_proj) — a serving-time
    transform for decode HBM-bandwidth relief.

    MEASURED NEUTRAL on v5e — 1.004x greedy / 1.003x beam at the product
    shape (docs/artifacts/weights_int8_ab.json) — and the compiled HLO
    says why: the kernels are while_loop INVARIANTS, so XLA hoists the
    int8->bf16 dequant out of the decode loop and materializes bf16
    copies once per call; every step then reads the same bf16 bytes as
    the unquantized path (verified: all s8 converts sit outside the
    while-body call tree). The int8 KV cache wins precisely because the
    cache is a loop CARRY — its dequant cannot be hoisted. The modeled
    1.33x (kernels ~710 MB vs ~580 MB int8 KV per step) is therefore
    unreachable via weight-only quantization under XLA's loop-invariant
    code motion; forcing in-loop int8 reads would need int8-consuming
    matmuls (W8A8 activation quantization — rejected: the beam int8
    experiment showed requant machinery losing 3.2x, and GPT-2
    activation outliers degrade W8A8 without smoothing).

    Each quantized dense becomes {kernel int8 [in,out], scale f32 [out],
    bias}; `_dense` consumes both formats. wte/wpe, layer norms, uk/uv
    image adapters and the feature transform stay at their original dtype.
    Kept as a serving knob (halves decoder param HBM at rest, useful for
    co-residency) — default OFF; the reference serves f32 torch weights
    (generate_reports_for_images.py).

    layout="pallas" stores the same int8 grid for CONSUMPTION by the
    Pallas dense kernel (ops/dense_wint8_pallas.py): dense dicts become
    {"kernel_q": int8 [in, out], "scale": f32 [1, out], "bias"} and
    `_dense` dequantizes INSIDE the kernel, in VMEM — the loop-invariant
    hoisting that neutralizes the XLA layout cannot apply, so decode's
    per-step weight HBM traffic genuinely halves. MEASURED NEGATIVE
    anyway (0.962x bf16, docs/artifacts/weights_int8_pallas_ab.json):
    96 per-op kernel launches/step cost more than the bytes save — see
    the kernel's module docstring. Both layouts stay opt-in knobs.
    """
    if layout not in ("xla", "pallas"):
        raise ValueError(f"unknown layout {layout!r}")
    out = dict(params)
    for name, block in params.items():
        if not name.startswith("h_"):
            continue
        bp = dict(block)
        for grp_name, kernels in (("attn", ("c_attn", "c_proj")),
                                  ("mlp", ("c_fc", "c_proj"))):
            grp = dict(bp[grp_name])
            for kn in kernels:
                w = jnp.asarray(grp[kn]["kernel"], jnp.float32)
                s = jnp.maximum(jnp.max(jnp.abs(w), axis=0) / 127.0, 1e-12)
                q = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
                if layout == "pallas":
                    grp[kn] = {"kernel_q": q, "scale": s[None, :],
                               "bias": grp[kn]["bias"]}
                else:
                    grp[kn] = {"kernel": q, "scale": s,
                               "bias": grp[kn]["bias"]}
            bp[grp_name] = grp
        out[name] = bp
    return out


def init_decoder_params(rng: jax.Array, cfg: DecoderConfig,
                        dtype=jnp.float32) -> Params:
    """Random init with GPT-2 conventions (N(0, 0.02), zeros bias). The real
    model loads converted HF/reference weights; this exists for tests and
    from-scratch experiments."""
    keys = iter(jax.random.split(rng, 8 + 16 * cfg.num_layers))
    n = lambda *shape: (jax.random.normal(next(keys), shape, dtype) * 0.02)  # noqa: E731
    z = lambda *shape: jnp.zeros(shape, dtype)  # noqa: E731
    ln = lambda: {"scale": jnp.ones((cfg.hidden_dim,), dtype),  # noqa: E731
                  "bias": z(cfg.hidden_dim)}
    d = cfg.hidden_dim
    params: Params = {
        "wte": {"embedding": n(cfg.vocab_size, d)},
        "wpe": {"embedding": n(cfg.max_positions, d)},
        "ln_f": ln(),
        "feature_transform": {
            "fc0": {"kernel": n(cfg.image_feature_dim, d), "bias": z(d)},
            "fc1": {"kernel": n(d, d), "bias": z(d)},
        },
    }
    for i in range(cfg.num_layers):
        params[f"h_{i}"] = {
            "ln_1": ln(),
            "ln_2": ln(),
            "attn": {
                "c_attn": {"kernel": n(d, 3 * d), "bias": z(3 * d)},
                "c_proj": {"kernel": n(d, d), "bias": z(d)},
                "uk": {"kernel": n(d, d), "bias": z(d)},
                "uv": {"kernel": n(d, d), "bias": z(d)},
            },
            "mlp": {
                "c_fc": {"kernel": n(d, 4 * d), "bias": z(4 * d)},
                "c_proj": {"kernel": n(4 * d, d), "bias": z(d)},
            },
        }
    return params


def feature_transform(params: Params, image_features: jnp.ndarray,
                      precision=None) -> jnp.ndarray:
    """Image-feature-space -> text-feature-space MLP
    (language_model.py:229-234). [N, 1024] -> [N, 1024]."""
    p = params["feature_transform"]
    h = jax.nn.relu(_dense(image_features, p["fc0"], precision))
    return _dense(h, p["fc1"], precision)


def _attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
               bias: jnp.ndarray, precision=None,
               attn_dropout=None) -> jnp.ndarray:
    """q [B,H,S,D] x k/v [B,H,T,D] with additive bias [B,1,S,T] (0 or -1e4).
    attn_dropout: optional fn applied to the softmax weights (training)."""
    scale = 1.0 / jnp.sqrt(jnp.asarray(v.shape[-1], q.dtype))
    w = jnp.einsum("bhsd,bhtd->bhst", q, k, precision=precision) * scale
    w = w + bias
    w = jax.nn.softmax(w, axis=-1).astype(v.dtype)
    if attn_dropout is not None:
        w = attn_dropout(w)
    return jnp.einsum("bhst,bhtd->bhsd", w, v, precision=precision)


def _block_attn_full(bp: Params, x_norm: jnp.ndarray, image_kv: Tuple[jnp.ndarray, jnp.ndarray],
                     bias: jnp.ndarray, cfg: DecoderConfig, precision=None,
                     attn_dropout=None):
    """Full-sequence pseudo-attention (training / scoring path).

    x_norm: [B, S, D]; image_kv: (k_img, v_img) each [B, 1, D] (already
    projected by uk/uv), or None for vanilla attention.
    Returns attn output [B, S, D].
    """
    qkv = _dense(x_norm, bp["c_attn"], precision)
    q, k_w, v_w = jnp.split(qkv, 3, axis=-1)
    if image_kv is not None:
        k = jnp.concatenate([image_kv[0], k_w], axis=1)  # [B, 1+S, D]
        v = jnp.concatenate([image_kv[1], v_w], axis=1)
    else:
        k, v = k_w, v_w
    qh = _split_heads(q, cfg.num_heads, cfg.head_dim)
    kh = _split_heads(k, cfg.num_heads, cfg.head_dim)
    vh = _split_heads(v, cfg.num_heads, cfg.head_dim)
    out = _attention(qh, kh, vh, bias, precision, attn_dropout)
    return _dense(_merge_heads(out), bp["c_proj"], precision)


def _positions_embed(params: Params, position_ids: jnp.ndarray,
                     cfg: DecoderConfig) -> jnp.ndarray:
    table = params["wte" if cfg.positions_from_wte else "wpe"]["embedding"]
    return table[position_ids]


def _apply_dropout(t: jnp.ndarray, rate: float, key: jax.Array) -> jnp.ndarray:
    keep = jax.random.bernoulli(key, 1.0 - rate, t.shape)
    return jnp.where(keep, t / (1.0 - rate), 0.0)


def forward_full(params: Params, input_ids: jnp.ndarray,
                 attention_mask: jnp.ndarray, image_features: jnp.ndarray,
                 cfg: DecoderConfig, precision=None,
                 dropout_rng: Optional[jax.Array] = None,
                 remat: bool = False) -> jnp.ndarray:
    """Teacher-forced forward over full sequences.

    input_ids/attention_mask: [B, S]; image_features: [B, 1024] (raw region
    features — the feature-space transform is applied here, as in
    language_model.py:284), or None for vanilla GPT-2 attention (no image
    slot; used for converter validation and plain-LM scoring).
    Returns lm_logits [B, S, vocab].

    remat=True checkpoints each transformer block (jax.checkpoint): only the
    per-layer residual inputs are saved for backward, block internals (qkv,
    attention weights, 4x-wide MLP hidden) are recomputed — the standard
    memory/FLOPs trade that lets the full 24-layer GPT-2 Medium train step
    fit one v5e chip's HBM. Forward-only callers never need it.
    """
    b, s = input_ids.shape
    with_image = image_features is not None
    if with_image:
        img = feature_transform(params, image_features, precision)[:, None, :]  # [B,1,D]
    else:
        img = None

    # training dropout (reference: embd/attn/resid p=0.1,
    # language_model.py:56-57,222); inference passes no rng -> deterministic.
    # Keys are pre-split into an array so each block body takes its keys as
    # traced args (jax.checkpoint recomputes the same bernoulli draws).
    use_dropout = dropout_rng is not None
    if use_dropout:
        all_keys = jax.random.split(dropout_rng, 1 + 3 * cfg.num_layers)
        embd_key = all_keys[0]
        layer_keys = all_keys[1:].reshape((cfg.num_layers, 3) + all_keys[0].shape)

    position_ids = jnp.arange(s)[None, :]
    x = params["wte"]["embedding"][input_ids] + _positions_embed(params, position_ids, cfg)
    if use_dropout:
        x = _apply_dropout(x, cfg.embd_dropout, embd_key)

    # bias [B, 1, S, (1+)S]: causal (image column always visible) + padding
    causal = jnp.tril(jnp.ones((s, s), bool))
    pad = attention_mask
    if with_image:
        causal = jnp.concatenate([jnp.ones((s, 1), bool), causal], axis=1)  # [S, 1+S]
        pad = jnp.concatenate(
            [jnp.ones((b, 1), attention_mask.dtype), attention_mask], axis=1)
    bias = jnp.where(causal[None, None], 0.0, MASK_VALUE)
    bias = bias + (1.0 - pad[:, None, None, :].astype(x.dtype)) * MASK_VALUE

    def block(x, bp, img, bias, keys):
        if with_image:
            image_kv = (_dense(img, bp["attn"]["uk"], precision),
                        _dense(img, bp["attn"]["uv"], precision))
        else:
            image_kv = None
        if use_dropout:
            def attn_dropout(w):
                return _apply_dropout(w, cfg.attn_dropout, keys[0])
        else:
            attn_dropout = None
        a = _block_attn_full(bp["attn"], _layer_norm(x, bp["ln_1"], cfg.layer_norm_eps),
                             image_kv, bias, cfg, precision,
                             attn_dropout=attn_dropout)
        if use_dropout:
            a = _apply_dropout(a, cfg.resid_dropout, keys[1])
        x = x + a
        m = _layer_norm(x, bp["ln_2"], cfg.layer_norm_eps)
        m = _dense(_gelu_new(_dense(m, bp["mlp"]["c_fc"], precision)),
                   bp["mlp"]["c_proj"], precision)
        if use_dropout:
            m = _apply_dropout(m, cfg.resid_dropout, keys[2])
        return x + m

    if remat:
        block = jax.checkpoint(block)

    for i in range(cfg.num_layers):
        x = block(x, params[f"h_{i}"], img, bias,
                  layer_keys[i] if use_dropout else None)

    x = _layer_norm(x, params["ln_f"], cfg.layer_norm_eps)
    return jnp.dot(x, params["wte"]["embedding"].T, precision=precision)


def language_model_loss(params: Params, input_ids: jnp.ndarray,
                        attention_mask: jnp.ndarray, image_features: jnp.ndarray,
                        cfg: DecoderConfig, precision=None) -> jnp.ndarray:
    """Shift-by-one CE with padding positions ignored
    (language_model.py:368-396): labels = input_ids, pad -> ignore, mean over
    non-ignored targets."""
    logits = forward_full(params, input_ids, attention_mask, image_features,
                          cfg, precision)
    shift_logits = logits[:, :-1, :]
    shift_labels = input_ids[:, 1:]
    shift_valid = attention_mask[:, 1:].astype(bool)

    logp = jax.nn.log_softmax(shift_logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, shift_labels[..., None], axis=-1)[..., 0]
    nll = jnp.where(shift_valid, nll, 0.0)
    denom = jnp.maximum(jnp.sum(shift_valid), 1)
    return jnp.sum(nll) / denom


# ---------------------------------------------------------------------------
# KV-cached generation path
# ---------------------------------------------------------------------------

def init_cache(batch: int, max_len: int, cfg: DecoderConfig,
               dtype=jnp.float32, pack_pairs: bool = False) -> Dict[str, jnp.ndarray]:
    """Static cache: slot 0 = image K/V, slots 1..max_len = tokens.

    dtype int8 enables the quantized cache: per-(layer, batch, head, slot)
    absmax scales ride along; decode dequantizes on read. Halves the
    per-step cache HBM traffic vs bf16 — the decode bottleneck at scale.

    pack_pairs merges adjacent head pairs into the lane dim —
    [L, B, H, T, D] -> [L, B, H/2, T, 2D], head h in lanes
    [(h%2)*D:(h%2+1)*D] of packed row h//2. With D=64 the standard layout
    pads its trailing dim to 128 lanes in TPU tiled layout (2x the HBM
    bytes); packed 2D=128 is pad-free. Same trick as the beam cache
    (cache_to_beam_layers), where it wins 1.60x; for GREEDY it measured
    SLOWER on v5e in both scale formulations and defaults OFF
    (docs/artifacts/greedy_packed_ab.json; decode/greedy.py docstring) —
    kept because the mechanism is shared and oracle-tested.
    """
    if pack_pairs and cfg.num_heads % 2 == 0:
        shape = (cfg.num_layers, batch, cfg.num_heads // 2, 1 + max_len,
                 2 * cfg.head_dim)
    else:
        shape = (cfg.num_layers, batch, cfg.num_heads, 1 + max_len,
                 cfg.head_dim)
    cache = {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}
    if dtype == jnp.int8:
        # packed int8 quantizes per PACKED ROW (one absmax over the head
        # pair) so the scale buffers keep their trailing-1 broadcast shape:
        # a trailing dim of 2 pads to 128 lanes in TPU tiled layout (64x
        # the bytes) and its jnp.repeat dequant materializes a full f32
        # cache copy per step — measured 2.8x SLOWER end to end
        # (docs/artifacts/greedy_packed_ab.json, first formulation).
        sshape = shape[:-1] + (1,)
        cache["k_scale"] = jnp.ones(sshape, jnp.float32)
        cache["v_scale"] = jnp.ones(sshape, jnp.float32)
    return cache


def _pack_head_pairs(val: jnp.ndarray) -> jnp.ndarray:
    """[B, H, S, D'] -> [B, H/2, S, 2D'] adjacent head pairs in lanes."""
    b, h, s, d = val.shape
    return (val.reshape(b, h // 2, 2, s, d)
            .transpose(0, 1, 3, 2, 4)
            .reshape(b, h // 2, s, 2 * d))


def _quantize_kv(x: jnp.ndarray):
    """Per-vector absmax int8 quantization over the head dim."""
    s = jnp.maximum(jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1,
                            keepdims=True) / 127.0, 1e-8)
    q = jnp.round(x.astype(jnp.float32) / s).astype(jnp.int8)
    return q, s


def _cache_read(cache: Dict[str, jnp.ndarray], name: str, layer: int,
                out_dtype) -> jnp.ndarray:
    """Dequantizing read of one layer's K or V: [B, H(/2), T, D(2D)]."""
    raw = cache[name][layer]
    if raw.dtype == jnp.int8:
        return (raw.astype(jnp.float32)
                * cache[f"{name}_scale"][layer]).astype(out_dtype)
    return raw.astype(out_dtype)


def prefill(params: Params, image_features: Optional[jnp.ndarray], bos_token: int,
            max_len: int, cfg: DecoderConfig, precision=None,
            cache_dtype=None, batch: Optional[int] = None,
            pack_pairs: bool = False):
    """Start generation: write image K/V to slot 0 and the BOS token's K/V to
    slot 1 of every layer; return (logits [B, vocab] for the BOS position,
    cache). Generation always starts from a single BOS with an all-ones mask
    (language_model.py:417-420), so this prefill covers exactly one position.

    image_features=None runs vanilla GPT-2 (pass `batch`): slot 0 stays zero
    and is masked out here and in decode_step (no_image=True).

    pack_pairs: head-pair-packed cache layout (see init_cache) — decode_step
    detects it from the buffer shape; numerics identical.
    """
    with_image = image_features is not None
    b = image_features.shape[0] if with_image else batch
    if cache_dtype is None:
        # follow the parameter dtype: bf16 params -> bf16 cache (halves the
        # per-step HBM cache traffic, the decode bottleneck)
        cache_dtype = params["wte"]["embedding"].dtype
    if with_image:
        img = feature_transform(params, image_features, precision)[:, None, :]
    pack = pack_pairs and cfg.num_heads % 2 == 0
    cache = init_cache(b, max_len, cfg, cache_dtype, pack_pairs=pack)

    ids = jnp.full((b, 1), bos_token, jnp.int32)
    pos = jnp.zeros((b, 1), jnp.int32)
    x = params["wte"]["embedding"][ids] + _positions_embed(params, pos, cfg)

    for i in range(cfg.num_layers):
        bp = params[f"h_{i}"]
        x_norm = _layer_norm(x, bp["ln_1"], cfg.layer_norm_eps)
        qkv = _dense(x_norm, bp["attn"]["c_attn"], precision)
        q, k_w, v_w = jnp.split(qkv, 3, axis=-1)
        qh = _split_heads(q, cfg.num_heads, cfg.head_dim)        # [B,H,1,D]
        kh = _split_heads(k_w, cfg.num_heads, cfg.head_dim)
        vh = _split_heads(v_w, cfg.num_heads, cfg.head_dim)

        if with_image:
            k_img = _split_heads(_dense(img, bp["attn"]["uk"], precision),
                                 cfg.num_heads, cfg.head_dim)    # [B,H,1,D]
            v_img = _split_heads(_dense(img, bp["attn"]["uv"], precision),
                                 cfg.num_heads, cfg.head_dim)
        else:
            k_img = jnp.zeros_like(kh)
            v_img = jnp.zeros_like(vh)

        k01 = jnp.concatenate([k_img, kh], axis=2)               # [B,H,2,D]
        v01 = jnp.concatenate([v_img, vh], axis=2)
        wk = _pack_head_pairs(k01) if pack else k01
        wv = _pack_head_pairs(v01) if pack else v01
        if cache_dtype == jnp.int8:
            # quantize the STORED layout (per packed row when packing) so
            # scales keep their trailing-1 broadcast shape — see init_cache
            qk, sk = _quantize_kv(wk)
            qv, sv = _quantize_kv(wv)
            cache["k"] = cache["k"].at[i, :, :, 0:2, :].set(qk)
            cache["v"] = cache["v"].at[i, :, :, 0:2, :].set(qv)
            cache["k_scale"] = cache["k_scale"].at[i, :, :, 0:2, :].set(sk)
            cache["v_scale"] = cache["v_scale"].at[i, :, :, 0:2, :].set(sv)
        else:
            cache["k"] = cache["k"].at[i, :, :, 0:2, :].set(wk.astype(cache_dtype))
            cache["v"] = cache["v"].at[i, :, :, 0:2, :].set(wv.astype(cache_dtype))

        if with_image:
            bias = jnp.zeros((1, 1, 1, 2), x.dtype)  # image + self visible
        else:
            bias = jnp.asarray([[[[MASK_VALUE, 0.0]]]], x.dtype)
        a = _attention(qh, k01, v01, bias, precision)
        x = x + _dense(_merge_heads(a), bp["attn"]["c_proj"], precision)
        m = _layer_norm(x, bp["ln_2"], cfg.layer_norm_eps)
        x = x + _dense(_gelu_new(_dense(m, bp["mlp"]["c_fc"], precision)),
                       bp["mlp"]["c_proj"], precision)

    x = _layer_norm(x, params["ln_f"], cfg.layer_norm_eps)
    logits = jnp.dot(x[:, 0, :], params["wte"]["embedding"].T, precision=precision)
    return logits, cache


def decode_step(params: Params, token: jnp.ndarray, step: jnp.ndarray,
                cache: Dict[str, jnp.ndarray], cfg: DecoderConfig,
                precision=None, no_image: bool = False):
    """One generation step.

    token: [B] token ids generated at position `step` (0-based over
    generated tokens; BOS was position 0, so this token's position id is
    step+1 and its cache slot is step+2... concretely: after prefill the
    cache holds slots [0]=image, [1]=BOS; the first decode_step consumes the
    token sampled from the prefill logits, position id 1, writing slot 2.

    Returns (logits [B, vocab], updated cache).
    """
    b = token.shape[0]
    pos = (step + 1) * jnp.ones((b, 1), jnp.int32)
    x = params["wte"]["embedding"][token[:, None]] + _positions_embed(params, pos, cfg)

    t_total = cache["k"].shape[3]
    # visibility: slots 0..step+2 inclusive hold data after this step's write
    slot = step + 2
    visible = jnp.arange(t_total)[None, None, None, :] <= slot
    if no_image:
        visible = visible & (jnp.arange(t_total)[None, None, None, :] != 0)
    bias = jnp.where(visible, 0.0, MASK_VALUE).astype(x.dtype)

    quantized = cache["k"].dtype == jnp.int8
    # head-pair-packed layout (init_cache pack_pairs=True): trailing dim 2D.
    # Pad-free lanes for D=64 — half the cache HBM bytes staged per step;
    # contraction over the full 2D lanes with zero-interleaved queries is
    # numerically identical (cross-head products hit structural zeros).
    # Same trick as decode_step_beam; measured on beam first
    # (docs/artifacts/beam_packed_ab.json).
    packed = cache["k"].shape[-1] == 2 * cfg.head_dim
    h2, d = cfg.num_heads // 2, cfg.head_dim
    for i in range(cfg.num_layers):
        bp = params[f"h_{i}"]
        x_norm = _layer_norm(x, bp["ln_1"], cfg.layer_norm_eps)
        qkv = _dense(x_norm, bp["attn"]["c_attn"], precision)
        q, k_w, v_w = jnp.split(qkv, 3, axis=-1)
        qh = _split_heads(q, cfg.num_heads, cfg.head_dim)        # [B,H,1,D]
        kh = _split_heads(k_w, cfg.num_heads, cfg.head_dim)
        vh = _split_heads(v_w, cfg.num_heads, cfg.head_dim)

        if quantized:
            qk, sk = _quantize_kv(_pack_head_pairs(kh) if packed else kh)
            qv, sv = _quantize_kv(_pack_head_pairs(vh) if packed else vh)
            cache = dict(cache)
            cache["k"] = jax.lax.dynamic_update_slice(
                cache["k"], qk[None], (i, 0, 0, slot, 0))
            cache["v"] = jax.lax.dynamic_update_slice(
                cache["v"], qv[None], (i, 0, 0, slot, 0))
            cache["k_scale"] = jax.lax.dynamic_update_slice(
                cache["k_scale"], sk[None], (i, 0, 0, slot, 0))
            cache["v_scale"] = jax.lax.dynamic_update_slice(
                cache["v_scale"], sv[None], (i, 0, 0, slot, 0))
        else:
            wk = _pack_head_pairs(kh) if packed else kh
            wv = _pack_head_pairs(vh) if packed else vh
            ck = jax.lax.dynamic_update_slice(
                cache["k"], wk.astype(cache["k"].dtype)[None], (i, 0, 0, slot, 0))
            cv = jax.lax.dynamic_update_slice(
                cache["v"], wv.astype(cache["v"].dtype)[None], (i, 0, 0, slot, 0))
            cache = {"k": ck, "v": cv}

        if packed:
            kp = _cache_read(cache, "k", i, x.dtype)             # [B,H2,T,2D]
            vp = _cache_read(cache, "v", i, x.dtype)
            q6 = qh[:, :, 0, :].reshape(b, h2, 2, d)
            zer = jnp.zeros_like(q6[:, :, 0])
            qp = jnp.stack([jnp.concatenate([q6[:, :, 0], zer], -1),
                            jnp.concatenate([zer, q6[:, :, 1]], -1)],
                           axis=2)                               # [B,H2,2,2D]
            sc = 1.0 / jnp.sqrt(jnp.asarray(d, x.dtype))
            w = jnp.einsum("bhpd,bhtd->bhpt", qp, kp,
                           precision=precision) * sc + bias
            w = jax.nn.softmax(w, axis=-1).astype(x.dtype)       # [B,H2,2,T]
            ctxp = jnp.einsum("bhpt,bhtd->bhpd", w, vp,
                              precision=precision)               # [B,H2,2,2D]
            # sub-head p's context lives in its own lane half
            ctx = jnp.stack([ctxp[:, :, 0, :d], ctxp[:, :, 1, d:]],
                            axis=2)                              # [B,H2,2,D]
            a = ctx.reshape(b, cfg.num_heads, 1, d)
        else:
            a = _attention(qh, _cache_read(cache, "k", i, x.dtype),
                           _cache_read(cache, "v", i, x.dtype),
                           bias, precision)
        x = x + _dense(_merge_heads(a), bp["attn"]["c_proj"], precision)
        m = _layer_norm(x, bp["ln_2"], cfg.layer_norm_eps)
        x = x + _dense(_gelu_new(_dense(m, bp["mlp"]["c_fc"], precision)),
                       bp["mlp"]["c_proj"], precision)

    x = _layer_norm(x, params["ln_f"], cfg.layer_norm_eps)
    logits = jnp.dot(x[:, 0, :], params["wte"]["embedding"].T, precision=precision)
    return logits, cache


def cache_to_beam_layers(cache, pack_pairs: bool = False):
    """[L, BK, H, T, *] (greedy layout) -> per-layer head-leading buffers
    {"k_0": [H, BK, T, *], ..., "v_23": ...} (one-time, after prefill).

    Two properties matter on TPU:
      - heads LEADING: the beam step's cross-lane attention dots batch over
        (h, b) with both operands batch-leading — no per-step transpose of
        the cache (against the greedy layout, XLA physically relayouts the
        whole cache every layer, every step);
      - per-LAYER buffers: a dot_general operand must be a materialized
        buffer, so reading layer i of a stacked [L, ...] cache materializes
        a full layer copy each step (measured ~67 us x 48 slices/step at
        192 rows on v5e); with per-layer carries the dot reads the
        dynamic_update_slice output directly, and the DUS is the carry's
        only consumer so it updates in place.

    pack_pairs: additionally merge ADJACENT HEAD PAIRS into the lane dim —
    [H, BK, T, D] -> [H/2, BK, T, 2D], head h landing in lanes
    [(h%2)*D:(h%2+1)*D] of packed row h//2. With D=64 the standard layout's
    trailing dim pads to 128 lanes in TPU tiled layout (2x the HBM bytes;
    the [16,1536,61,64] B=64 beam cache OOMs v5e at 2.1x pad), while the
    packed trailing 2D=128 is pad-free. decode_step_beam detects the
    layout from the buffer shape and contracts the packed lanes with
    zero-interleaved queries (numerically identical — cross-head lane
    products are multiplied by structural zeros). int8 caches are never
    packed (the per-slot scale buffers don't pack, and beam serves bf16
    per docs/artifacts/beam_int8_ab.json)."""
    quantized = cache["k"].dtype == jnp.int8
    out = {}
    for name, c in cache.items():
        for i in range(c.shape[0]):
            buf = c[i].swapaxes(0, 1)
            if (pack_pairs and not quantized and name in ("k", "v")
                    and buf.shape[0] % 2 == 0):
                h, bk, t, d = buf.shape
                buf = (buf.reshape(h // 2, 2, bk, t, d)
                       .transpose(0, 2, 3, 1, 4)
                       .reshape(h // 2, bk, t, 2 * d))
            out[f"{name}_{i}"] = buf
    return out


def decode_step_beam(params: Params, token: jnp.ndarray, step: jnp.ndarray,
                     cache: Dict[str, jnp.ndarray], ancestry: jnp.ndarray,
                     cfg: DecoderConfig, precision=None,
                     no_image: bool = False, pallas_attn: bool = False):
    """One beam-search generation step with ancestry-masked attention.

    token: [B*K] (b-major rows); cache: per-layer head-leading buffers
    {"k_i"/"v_i" [H, B*K, T, D], optional "k_scale_i"/"v_scale_i"} from
    cache_to_beam_layers; ancestry: [B, K, T] int32 — for each (item, live
    beam, cache slot) the LANE whose K/V holds that slot's token.

    The cache is NEVER reordered: lanes only receive dynamic_update_slice
    writes, so XLA keeps the while_loop carry aliased in place (the greedy
    path's property). Beam reordering — HF's _reorder_cache, reference
    language_model.py:529-607 via GenerationMixin — becomes a gather of the
    tiny ancestry table instead of the full cache (~7 ms/step of HBM copies
    at 192 rows on v5e). Each query attends over all K*T lane-slots of its
    item via a one-hot ancestry contraction — softmax over exactly the T
    ancestry slots, numerically identical to the gathered path.

    (Fused Pallas attention: three early formulations died —
    python-unrolled heads blew up compile time, fori_loop heads OOMed the
    16 MB scoped-VMEM budget through cumulative per-iteration temporaries,
    batched-dot / VMEM-scratch heads crashed the Mosaic compiler with an
    opaque internal error. A 4th formulation (ops/beam_attn_pallas.py:
    grid over head-pair x item-block, pre-flattened selection mask,
    single-contracting-dim 2-D matmuls) compiles and runs on v5e —
    pass pallas_attn=True/int to use it; see
    docs/artifacts/beam_pallas_attn_ab.json for the measured A/B vs this
    XLA one-hot path, which remains the default.)

    Returns (logits [B*K, vocab], updated cache).
    """
    bk = token.shape[0]
    b, k_beams, t_total = ancestry.shape
    pos = (step + 1) * jnp.ones((bk, 1), jnp.int32)
    x = params["wte"]["embedding"][token[:, None]] + _positions_embed(params, pos, cfg)

    slot = step + 2
    quantized = cache["k_0"].dtype == jnp.int8
    # head-PAIR-packed layout (cache_to_beam_layers pack_pairs=True):
    # trailing dim is 2D lanes, leading dim H/2 packed rows
    packed = cache["k_0"].shape[-1] == 2 * cfg.head_dim
    scale = 1.0 / jnp.sqrt(jnp.asarray(cfg.head_dim, x.dtype))

    t_idx = jnp.arange(t_total)
    visible = t_idx[None, None, None, :] <= slot                   # [1,1,1,T]
    if no_image:
        visible = visible & (t_idx[None, None, None, :] != 0)
    vis_bias = jnp.where(visible, 0.0, MASK_VALUE).astype(x.dtype)
    onehot = (ancestry[:, :, None, :]
              == jnp.arange(k_beams)[None, None, :, None]).astype(x.dtype)
    onehot = onehot[None]                                          # [1,B,K,J,T]

    h2, d = cfg.num_heads // 2, cfg.head_dim

    # fused Pallas attention (4th formulation — the first three died; see
    # ops/beam_attn_pallas.py): packed layout only, item count must tile.
    # pallas_attn may be True (default block) or an int item_block.
    use_pallas = bool(pallas_attn) and packed and not quantized
    if use_pallas:
        from rgrg_tpu.ops.beam_attn_pallas import (ITEM_BLOCK,
                                                   beam_attention_pallas)
        item_block = (pallas_attn if isinstance(pallas_attn, int)
                      and not isinstance(pallas_attn, bool) else ITEM_BLOCK)
        use_pallas = b % item_block == 0
    if use_pallas:
        pallas_interpret = jax.default_backend() == "cpu"
        # per-row ancestry with visibility folded in as -1 (step-level,
        # layer-invariant): row r = (item*K + beam)*2 + sub-head p
        anc_rows = jnp.repeat(ancestry.reshape(b * k_beams, t_total),
                              2, axis=0)                           # [R2,T]
        anc_q = jnp.where(visible[0, 0], anc_rows, -1).astype(jnp.int32)

    def hlead(val):
        # [BK, H, 1, D'] projection -> [H, BK, 1, D'] cache write block
        # (packed: -> [H/2, BK, 1, 2D'] adjacent head pairs in lanes)
        if packed:
            dd = val.shape[-1]
            return (val.swapaxes(0, 1).reshape(h2, 2, bk, 1, dd)
                    .transpose(0, 2, 3, 1, 4).reshape(h2, bk, 1, 2 * dd))
        return val.swapaxes(0, 1)

    def read(name, i):
        raw = cache[f"{name}_{i}"]
        if raw.dtype == jnp.int8:
            raw = (raw.astype(jnp.float32)
                   * cache[f"{name}_scale_{i}"]).astype(x.dtype)
        heads = h2 if packed else cfg.num_heads
        return raw.astype(x.dtype).reshape(
            heads, b, k_beams, t_total, -1)                # [H(/2),B,J,T,D']

    for i in range(cfg.num_layers):
        bp = params[f"h_{i}"]
        x_norm = _layer_norm(x, bp["ln_1"], cfg.layer_norm_eps)
        qkv = _dense(x_norm, bp["attn"]["c_attn"], precision)
        q, k_w, v_w = jnp.split(qkv, 3, axis=-1)
        qh = _split_heads(q, cfg.num_heads, cfg.head_dim)          # [BK,H,1,D]
        kh = _split_heads(k_w, cfg.num_heads, cfg.head_dim)
        vh = _split_heads(v_w, cfg.num_heads, cfg.head_dim)

        cache = dict(cache)
        if quantized:
            qk, sk = _quantize_kv(kh)
            qv, sv = _quantize_kv(vh)
            writes = (("k", qk), ("v", qv), ("k_scale", sk), ("v_scale", sv))
        else:
            writes = (("k", kh.astype(cache[f"k_{i}"].dtype)),
                      ("v", vh.astype(cache[f"v_{i}"].dtype)))
        for name, val in writes:
            cache[f"{name}_{i}"] = jax.lax.dynamic_update_slice(
                cache[f"{name}_{i}"], hlead(val), (0, 0, slot, 0))

        if not use_pallas:
            k_all = read("k", i)                                   # [H,B,J,T,D]
            v_all = read("v", i)
        q5 = qh[:, :, 0, :].swapaxes(0, 1).reshape(
            cfg.num_heads, b, k_beams, cfg.head_dim)               # [H,B,K,D]
        # dot_general (MXU) formulation. Two alternatives measured SLOWER
        # on v5e and rejected:
        #   * broadcast-multiply-reduce (dequant fused into reduce
        #     fusions, no materialized dot operands): 2.6x slower (6.5 vs
        #     17 r/s at B=8) — the VPU reduce over [H,B,K,J,T,D] loses to
        #     the MXU dots even counting the dequantized-operand
        #     materialization;
        #   * full int8 x int8 MXU dots (round 4, VERDICT #6: per-step
        #     absmax-requantized q and vs-folded softmax weights, int32
        #     accumulation, scales applied outside — avoids the dequant
        #     materialization entirely): 3.2x slower than bf16 at B=32
        #     (96.2 vs 29.7 ms/step, docs/artifacts/beam_int8_ab.json) —
        #     the per-step requantizations plus f32 score traffic cost
        #     more than the dequant copy they remove. The int8-beam
        #     collapse is structural; serving keeps bf16 cache for beam
        #     (bench.py BEAM_PRODUCT_KV).
        if packed:
            # zero-interleaved queries: packed row r holds heads (2r, 2r+1)
            # in lane halves; sub-query p zeroes the OTHER head's lanes, so
            # contracting the full 2D lanes yields exactly q_p . k_p (the
            # cross-head lane products hit structural zeros). 2x q-side MXU
            # work on a 3%-utilized unit for HALF the cache bytes staged.
            q6 = q5.reshape(h2, 2, b, k_beams, d)
            zer = jnp.zeros_like(q6[:, 0])
            qp = jnp.stack([jnp.concatenate([q6[:, 0], zer], -1),
                            jnp.concatenate([zer, q6[:, 1]], -1)],
                           axis=3)                                 # [H2,B,K,2,2D]
            if use_pallas:
                # stream this layer's K/V through VMEM once, fused
                # scores/mask/softmax/context (ops/beam_attn_pallas.py)
                qz = (qp * scale).astype(x.dtype).reshape(
                    h2, b * k_beams * 2, 2 * d)
                ctxp = beam_attention_pallas(
                    qz, cache[f"k_{i}"], cache[f"v_{i}"], anc_q,
                    k_beams=k_beams, item_block=item_block,
                    interpret=pallas_interpret)
                ctxp = ctxp.reshape(h2, b, k_beams, 2, 2 * d).astype(x.dtype)
            else:
                s_all = jnp.einsum("hbkpd,hbjtd->hbkpjt", qp, k_all,
                                   precision=precision) * scale
                w = jnp.sum(s_all * onehot[:, :, :, None], axis=4) + vis_bias
                w = jax.nn.softmax(w, axis=-1).astype(x.dtype)     # [H2,B,K,2,T]
                wsel = w[..., None, :] * onehot[:, :, :, None]     # [H2,B,K,2,J,T]
                ctxp = jnp.einsum("hbkpjt,hbjtd->hbkpd", wsel, v_all,
                                  precision=precision)             # [H2,B,K,2,2D]
            # sub-head p's context lives in its own lane half
            ctx = jnp.stack([ctxp[:, :, :, 0, :d], ctxp[:, :, :, 1, d:]],
                            axis=1).reshape(cfg.num_heads, b, k_beams, d)
        else:
            s_all = jnp.einsum("hbkd,hbjtd->hbkjt", q5, k_all,
                               precision=precision) * scale        # [H,B,K,J,T]
            w = jnp.sum(s_all * onehot, axis=3) + vis_bias         # [H,B,K,T]
            w = jax.nn.softmax(w, axis=-1).astype(x.dtype)
            wsel = w[:, :, :, None, :] * onehot                    # [H,B,K,J,T]
            ctx = jnp.einsum("hbkjt,hbjtd->hbkd", wsel, v_all,
                             precision=precision)
        a = ctx.reshape(cfg.num_heads, bk, cfg.head_dim
                        ).swapaxes(0, 1)[:, :, None, :]            # [BK,H,1,D]

        x = x + _dense(_merge_heads(a), bp["attn"]["c_proj"], precision)
        m = _layer_norm(x, bp["ln_2"], cfg.layer_norm_eps)
        x = x + _dense(_gelu_new(_dense(m, bp["mlp"]["c_fc"], precision)),
                       bp["mlp"]["c_proj"], precision)

    x = _layer_norm(x, params["ln_f"], cfg.layer_norm_eps)
    logits = jnp.dot(x[:, 0, :], params["wte"]["embedding"].T, precision=precision)
    return logits, cache
