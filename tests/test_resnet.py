"""Backbone parity: flax ResNetBackbone + converter vs torch oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from rgrg_tpu.core.torch_convert import (
    convert_resnet_backbone, sequential_backbone_to_named, state_dict_to_numpy)
from rgrg_tpu.models.resnet import ResNetBackbone

from tests.torch_ref import TorchResNet50Backbone, randomize_bn_stats


def _small_backbone_pair(stage_sizes=(1, 1, 1, 1), seed=0):
    gen = torch.Generator().manual_seed(seed)
    tm = TorchResNet50Backbone(in_channels=1, stage_sizes=stage_sizes)
    randomize_bn_stats(tm, gen)
    tm.eval()
    sd = state_dict_to_numpy(tm.state_dict())
    variables = convert_resnet_backbone(sd, stage_sizes=stage_sizes)
    jm = ResNetBackbone(stage_sizes=stage_sizes, in_channels=1)
    return tm, jm, jax.tree.map(jnp.asarray, variables)


def test_backbone_parity_small():
    tm, jm, variables = _small_backbone_pair()
    x = np.random.default_rng(0).normal(0, 1, (2, 1, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()  # NCHW
    got = jm.apply(variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))), train=False)
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_backbone_full_resnet50_shapes_and_parity():
    tm, jm, variables = _small_backbone_pair(stage_sizes=(3, 4, 6, 3), seed=1)
    x = np.random.default_rng(1).normal(0, 1, (1, 1, 128, 128)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()
    got = jm.apply(variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))), train=False)
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    assert want.shape == (1, 2048, 4, 4)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=5e-4)


def test_sequential_key_mapping():
    sd = {"0.weight": np.zeros(1), "1.weight": np.zeros(1), "1.bias": np.zeros(1),
          "4.0.conv1.weight": np.zeros(1), "7.2.bn3.running_var": np.zeros(1)}
    named = sequential_backbone_to_named(sd)
    assert set(named) == {"conv1.weight", "bn1.weight", "bn1.bias",
                          "layer1.0.conv1.weight", "layer4.2.bn3.running_var"}


def test_param_tree_matches_init():
    """Converted tree must have exactly the structure flax init produces."""
    jm = ResNetBackbone(stage_sizes=(1, 1, 1, 1), in_channels=1)
    init = jm.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1)), train=False)
    tm = TorchResNet50Backbone(in_channels=1, stage_sizes=(1, 1, 1, 1))
    conv = convert_resnet_backbone(state_dict_to_numpy(tm.state_dict()),
                                   stage_sizes=(1, 1, 1, 1))
    init_paths = {jax.tree_util.keystr(k) for k, _ in
                  jax.tree_util.tree_flatten_with_path(init)[0]}
    conv_paths = {jax.tree_util.keystr(k) for k, _ in
                  jax.tree_util.tree_flatten_with_path(conv)[0]}
    assert init_paths == conv_paths
    for (kp, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(init)[0],
            jax.tree_util.tree_flatten_with_path(conv)[0]):
        assert a.shape == b.shape, f"{jax.tree_util.keystr(kp)}: {a.shape} vs {b.shape}"
