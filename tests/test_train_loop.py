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
        return 1.0

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
