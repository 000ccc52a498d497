"""Decoder weight conversion: tiny HF GPT2LMHeadModel -> our params, logits
must match HF's forward exactly (vanilla attention, wpe positions)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import torch
from transformers import GPT2Config, GPT2LMHeadModel

from rgrg_tpu.core.config import DecoderConfig
from rgrg_tpu.core.torch_convert import convert_hf_gpt2_lm, state_dict_to_numpy
from rgrg_tpu.models import gpt2


def test_hf_gpt2_conversion_parity():
    hf_cfg = GPT2Config(vocab_size=97, n_positions=64, n_embd=32, n_layer=3,
                        n_head=4, resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0)
    torch.manual_seed(0)
    hf = GPT2LMHeadModel(hf_cfg).eval()

    params = convert_hf_gpt2_lm(state_dict_to_numpy(hf.state_dict()), num_layers=3)
    params = jax.tree.map(jnp.asarray, params)

    cfg = DecoderConfig(vocab_size=97, hidden_dim=32, num_heads=4, num_layers=3,
                        max_positions=64, positions_from_wte=False)

    ids = np.random.default_rng(0).integers(0, 97, (2, 10)).astype(np.int64)
    mask = np.ones((2, 10), np.float32)
    with torch.no_grad():
        want = hf(input_ids=torch.from_numpy(ids)).logits.numpy()

    got = gpt2.forward_full(params, jnp.asarray(ids.astype(np.int32)),
                            jnp.asarray(mask), None, cfg)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_language_model_key_mapping():
    """Reference-level key paths (gpt_with_lm_head.transformer.*, uk/uv,
    feature_space_transformation_nn.*) map onto the init tree exactly."""
    cfg = DecoderConfig(vocab_size=11, hidden_dim=8, num_heads=2, num_layers=2,
                        max_positions=16, image_feature_dim=8)
    rng = np.random.default_rng(0)

    def t_lin(i, o):
        return rng.normal(0, 1, (o, i)).astype(np.float32)  # torch [out, in]

    sd = {}
    p = "gpt_with_lm_head.transformer."
    sd[p + "wte.weight"] = rng.normal(0, 1, (11, 8)).astype(np.float32)
    sd[p + "wpe.weight"] = rng.normal(0, 1, (16, 8)).astype(np.float32)
    for nm in ("ln_f.weight", "ln_f.bias"):
        sd[p + nm] = rng.normal(0, 1, (8,)).astype(np.float32)
    for i in range(2):
        h = f"{p}h.{i}."
        for nm in ("ln_1", "ln_2"):
            sd[h + nm + ".weight"] = rng.normal(0, 1, (8,)).astype(np.float32)
            sd[h + nm + ".bias"] = rng.normal(0, 1, (8,)).astype(np.float32)
        sd[h + "attn.c_attn.weight"] = rng.normal(0, 1, (8, 24)).astype(np.float32)
        sd[h + "attn.c_attn.bias"] = rng.normal(0, 1, (24,)).astype(np.float32)
        sd[h + "attn.c_proj.weight"] = rng.normal(0, 1, (8, 8)).astype(np.float32)
        sd[h + "attn.c_proj.bias"] = rng.normal(0, 1, (8,)).astype(np.float32)
        sd[h + "attn.uk.weight"] = t_lin(8, 8)
        sd[h + "attn.uk.bias"] = rng.normal(0, 1, (8,)).astype(np.float32)
        sd[h + "attn.uv.weight"] = t_lin(8, 8)
        sd[h + "attn.uv.bias"] = rng.normal(0, 1, (8,)).astype(np.float32)
        sd[h + "mlp.c_fc.weight"] = rng.normal(0, 1, (8, 32)).astype(np.float32)
        sd[h + "mlp.c_fc.bias"] = rng.normal(0, 1, (32,)).astype(np.float32)
        sd[h + "mlp.c_proj.weight"] = rng.normal(0, 1, (32, 8)).astype(np.float32)
        sd[h + "mlp.c_proj.bias"] = rng.normal(0, 1, (8,)).astype(np.float32)
    sd["feature_space_transformation_nn.0.weight"] = t_lin(8, 8)
    sd["feature_space_transformation_nn.0.bias"] = rng.normal(0, 1, (8,)).astype(np.float32)
    sd["feature_space_transformation_nn.2.weight"] = t_lin(8, 8)
    sd["feature_space_transformation_nn.2.bias"] = rng.normal(0, 1, (8,)).astype(np.float32)

    from rgrg_tpu.core.torch_convert import convert_language_model
    params = convert_language_model(sd, num_layers=2)

    init = gpt2.init_decoder_params(jax.random.PRNGKey(0), cfg)
    init_paths = {jax.tree_util.keystr(k): v.shape for k, v in
                  jax.tree_util.tree_flatten_with_path(init)[0]}
    conv_paths = {jax.tree_util.keystr(k): v.shape for k, v in
                  jax.tree_util.tree_flatten_with_path(params)[0]}
    assert init_paths == conv_paths

    # spot-check the torch-Linear transpose on uk
    np.testing.assert_allclose(params["h_0"]["attn"]["uk"]["kernel"],
                               sd[p + "h.0.attn.uk.weight"].T)
    # and the HF Conv1D no-transpose on c_attn
    np.testing.assert_allclose(params["h_1"]["attn"]["c_attn"]["kernel"],
                               sd[p + "h.1.attn.c_attn.weight"])
