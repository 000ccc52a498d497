"""Training loop driver test (tiny model, 3 steps, checkpoint roundtrip)."""

import os

import numpy as np
import jax
import pytest

from rgrg_tpu.core.config import RGRGConfig, TrainConfig
from rgrg_tpu.models.full_model import RGRG
from rgrg_tpu.train.loop import PlateauScheduler, train

from tests.test_train import TRAIN_CFG, _batch


def test_plateau_scheduler():
    p = PlateauScheduler(factor=0.5, patience=1)
    assert p.update(1.0) == 1.0       # improvement
    assert p.update(1.1) == 1.0       # bad 1 (<= patience)
    assert p.update(1.2) == 0.5       # bad 2 -> reduce
    assert p.update(0.5) == 0.5       # new best


def test_lr_scale_exactly_scales_updates():
    """set_lr_scale(s) must be exactly equivalent to using lr*s — the
    ReduceLROnPlateau mechanism (reference
    training_script_object_detector.py:621)."""
    import jax.numpy as jnp
    from rgrg_tpu.train import trainer

    params = {"detector": {"w": jnp.ones((4, 4)), "b": jnp.zeros(4)},
              "decoder": {"uk": jnp.ones(3)}}
    tcfg = TrainConfig(grad_accumulation_steps=1, learning_rate=1e-3)
    opt = trainer.make_optimizer(params, tcfg, stage=2)
    opt_state = opt.init(params)
    assert trainer.get_lr_scale(opt_state) == 1.0

    grads = jax.tree.map(lambda p: jnp.full_like(p, 0.3), params)
    u_full, _ = opt.update(grads, opt_state, params)
    half_state = trainer.set_lr_scale(opt_state, 0.5)
    assert trainer.get_lr_scale(half_state) == 0.5
    u_half, _ = opt.update(grads, half_state, params)

    uf = np.asarray(u_full["detector"]["w"])
    uh = np.asarray(u_half["detector"]["w"])
    assert np.abs(uf).max() > 0
    np.testing.assert_allclose(uh, 0.5 * uf, rtol=1e-6)
    # frozen subtree stays zero either way
    assert np.asarray(u_half["decoder"]["uk"]).max() == 0


def test_lr_scale_found_under_multisteps():
    import jax.numpy as jnp
    from rgrg_tpu.train import trainer

    params = {"detector": {"w": jnp.ones(2)}, "decoder": {"uk": jnp.ones(2)}}
    tcfg = TrainConfig(grad_accumulation_steps=4)
    opt = trainer.make_optimizer(params, tcfg, stage=2)
    state = trainer.set_lr_scale(opt.init(params), 0.25)
    assert trainer.get_lr_scale(state) == 0.25


@pytest.mark.slow
def test_train_loop_end_to_end(tmp_path):
    from rgrg_tpu.core.config import MeshConfig
    # single-device mesh: the 2-device SPMD compile of the full train step
    # is pathologically slow on the CPU backend; multi-device sharding is
    # covered by __graft_entry__.dryrun_multichip and test_mesh_inference
    cfg = RGRGConfig(model=TRAIN_CFG,
                     train=TrainConfig(grad_accumulation_steps=1, seed=0),
                     mesh=MeshConfig(num_devices=1))
    model = RGRG(cfg=cfg.model)
    batches = [_batch() for _ in range(2)]

    calls = {"val": 0}

    def val_fn(state):
        calls["val"] += 1
        # dict form: per-module val losses (reference val_losses_dict);
        # the loop must log each module and drive plateau from "total"
        return {"total": 1.0, "obj_detector_loss": 0.6,
                "language_model_loss": 0.4}

    run_dir = str(tmp_path / "run")
    state = train(model, cfg, lambda: iter(batches), run_dir, stage=2,
                  num_epochs=1, val_fn=val_fn, evaluate_every=2,
                  max_steps=2)
    assert int(state.step) == 2
    assert calls["val"] == 1
    assert os.path.exists(os.path.join(run_dir, "last"))
    assert os.path.exists(os.path.join(run_dir, "metrics.jsonl"))

    # resume restores the step counter
    state2 = train(model, cfg, lambda: iter(batches), run_dir, stage=2,
                   num_epochs=1, resume_from=os.path.join(run_dir, "last"),
                   max_steps=3)
    assert int(state2.step) == 3

    # plateau fires on stalled validation and rewrites the optimizer's
    # LR scale in place (patience=0 -> second non-improving val halves it)
    from rgrg_tpu.train import trainer as trainer_lib
    cfg_p = RGRGConfig(model=TRAIN_CFG,
                       train=TrainConfig(grad_accumulation_steps=1, seed=0,
                                         lr_patience=0, lr_factor=0.5),
                       mesh=MeshConfig(num_devices=1))
    state3 = train(model, cfg_p, lambda: iter(batches), str(tmp_path / "p"),
                   stage=2, num_epochs=1, val_fn=lambda s: 1.0,
                   evaluate_every=1, max_steps=2)
    assert trainer_lib.get_lr_scale(state3.opt_state) == 0.5
