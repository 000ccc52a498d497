"""Sharded TRAIN step on a multi-device virtual mesh.

Exercises gradient all-reduce + optimizer update under pjit sharding (the
framework's DP strategy, SURVEY.md §2.6): losses must be finite and match
the single-device step on the same global batch (SPMD computes the same
math; f32 CPU reassociation tolerance only).
"""

import dataclasses

import numpy as np
import jax
import pytest

from rgrg_tpu.core import mesh as mesh_lib
from rgrg_tpu.core.config import DetectorConfig, ModelConfig, TrainConfig
from rgrg_tpu.models.full_model import RGRG
from rgrg_tpu.train import trainer

from tests.test_train import TRAIN_CFG, _batch

# shallow backbone (one block per stage): full train-step structure — every
# loss, BN stats, frozen-GPT-2 partition — at a CPU-compilable size (the
# same trick as __graft_entry__.dryrun_multichip)
SHALLOW_CFG = dataclasses.replace(
    TRAIN_CFG,
    detector=dataclasses.replace(TRAIN_CFG.detector,
                                 backbone_stages=(1, 1, 1, 1)))


@pytest.mark.slow
def test_sharded_train_step_matches_single_device():
    model = RGRG(cfg=SHALLOW_CFG)
    tcfg = TrainConfig(grad_accumulation_steps=1)
    batch = _batch(b=2)

    def run(n_devices):
        mesh = mesh_lib.make_mesh(n_devices)
        with mesh:
            state, opt = trainer.init_train_state(
                model, jax.random.PRNGKey(0), tcfg, stage=3)
            state = trainer.TrainState(
                mesh_lib.replicate_pytree(state.params, mesh),
                mesh_lib.replicate_pytree(state.opt_state, mesh),
                jax.device_put(state.step, mesh_lib.replicated(mesh)))
            sharded = mesh_lib.shard_pytree_batch(batch, mesh)
            step = trainer.make_train_step(model, tcfg, opt, stage=3,
                                           lm_budget=16)
            new_state, losses = step(state, sharded, jax.random.PRNGKey(1))
            probe = new_state.params["decoder"]["h_0"]["attn"]["uk"]["kernel"]
            return jax.tree.map(float, losses), np.asarray(probe)

    losses_1, probe_1 = run(1)
    losses_2, probe_2 = run(2)

    assert losses_2.keys() == losses_1.keys() and losses_2
    for k in losses_2:
        assert np.isfinite(losses_2[k]), f"{k} not finite on 2-device mesh"
        np.testing.assert_allclose(losses_2[k], losses_1[k], rtol=2e-3,
                                   atol=2e-4, err_msg=k)
    # the optimizer update (after the gradient all-reduce) matches too
    np.testing.assert_allclose(probe_2, probe_1, rtol=2e-3, atol=2e-4)
