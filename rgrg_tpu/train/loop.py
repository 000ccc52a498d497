"""Training driver: epoch/step loop for the 3-stage protocol.

Reference equivalents: training_script_object_detector.py (stage 1) and
train_full_model.py (stages 2/3). Differences by design:
  - checkpoint/RESUME is first-class (orbax full-state save/restore; the
    reference's resume path is commented out, train_full_model.py:565-586);
  - no OOM catch-and-skip: static shapes make memory use constant
    (SURVEY.md §5), and the `-1` empty-selection sentinel is gone (masks);
  - data parallelism over the device mesh instead of grad accumulation
    (accumulation remains available via TrainConfig.grad_accumulation_steps).

ReduceLROnPlateau is replicated via optax.contrib.reduce_on_plateau-style
logic implemented here (factor 0.5 on stalled validation loss). The scale
takes effect through trainer.lr_scale_transform — a multiplicative update
scale chained after adamw, mutated in the optimizer state each time the
plateau scheduler fires (exactly equivalent to changing adamw's lr, which
its update is linear in).
"""

from __future__ import annotations

import dataclasses
import logging
import os
import time
from typing import Any, Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from rgrg_tpu.core import mesh as mesh_lib
from rgrg_tpu.core.checkpoint import load_checkpoint, save_checkpoint
from rgrg_tpu.core.config import RGRGConfig
from rgrg_tpu.models.full_model import RGRG
from rgrg_tpu.train import trainer
from rgrg_tpu.utils.logging import MetricWriter

log = logging.getLogger(__name__)


@dataclasses.dataclass
class PlateauScheduler:
    """torch ReduceLROnPlateau(mode="min", threshold_mode="rel") state
    machine, replicated step for step (torch/optim/lr_scheduler.py), with
    the reference's arguments factor=0.5, patience=5, threshold=1e-3,
    cooldown=5 (training_script_object_detector.py:47-50,621;
    train_full_model.py:588):

      - improvement means val < best * (1 - threshold)  [rel mode, min]
      - during cooldown (after a reduction) bad-epoch counting is paused
      - reduce when num_bad_epochs > patience, then enter cooldown
      - a reduction smaller than eps is skipped (torch's `eps` guard)
    """
    factor: float = 0.5
    patience: int = 5
    threshold: float = 1e-3
    cooldown: int = 5
    eps: float = 1e-8
    best: float = float("inf")
    bad_count: int = 0
    cooldown_counter: int = 0
    scale: float = 1.0

    def update(self, val_loss: float) -> float:
        if val_loss < self.best * (1.0 - self.threshold):
            self.best = val_loss
            self.bad_count = 0
        else:
            self.bad_count += 1
        if self.cooldown_counter > 0:
            self.cooldown_counter -= 1
            self.bad_count = 0
        if self.bad_count > self.patience:
            new_scale = self.scale * self.factor
            if self.scale - new_scale > self.eps:
                self.scale = new_scale
            self.cooldown_counter = self.cooldown
            self.bad_count = 0
        return self.scale


def warm_start_params(params, init_params):
    """Stage-(N-1) -> stage-N parameter handoff (the reference loads the
    previous stage's checkpoint into the next stage's model,
    run_configurations.py:11-28 / train_full_model.py:289-302): every
    top-level subtree present in init_params replaces the random init;
    subtrees absent from init_params (e.g. the decoder when warm-starting
    stage 2 from a stage-1 detector checkpoint) keep their fresh init.
    Raises on unknown subtree keys so a mis-keyed checkpoint fails loudly."""
    params = dict(params)
    for key, sub in init_params.items():
        if key not in params:
            raise KeyError(f"warm-start subtree {key!r} not in model params "
                           f"(have {sorted(params)})")
        params[key] = jax.tree.map(jnp.asarray, sub)
    return params


def train(model: RGRG, cfg: RGRGConfig, train_batches: Callable[[], Iterable],
          run_dir: str, stage: int = 3, num_epochs: int = 1,
          val_fn: Optional[Callable[[Any], float]] = None,
          evaluate_every: Optional[int] = None,
          lm_budget: int = 128, resume_from: Optional[str] = None,
          checkpoint_every: Optional[int] = None,
          max_steps: Optional[int] = None,
          init_params: Optional[Any] = None) -> trainer.TrainState:
    """train_batches: factory returning a fresh batch iterator per epoch.
    val_fn(state) -> validation loss (called every `evaluate_every` steps).
    init_params: optional warm-start weights (e.g. a converted reference
    checkpoint); subtrees present in it replace the random init — the
    stage-(N-1) -> stage-N handoff of the reference protocol.
    """
    tcfg = cfg.train
    writer = MetricWriter(run_dir)
    writer.write_config(cfg)

    state, optimizer = trainer.init_train_state(
        model, jax.random.PRNGKey(tcfg.seed), tcfg, stage=stage)
    if init_params is not None:
        params = warm_start_params(state.params, init_params)
        state = trainer.TrainState(params, optimizer.init(params), state.step)
    if resume_from:
        state = load_checkpoint(resume_from, target=state)
        log.info("resumed from %s at step %s", resume_from, int(state.step))

    # mesh is built lazily at the first batch so its size can be clamped to
    # divide the actual batch size
    mesh = None
    step_fn = trainer.make_train_step(model, tcfg, optimizer, stage=stage,
                                      lm_budget=lm_budget)

    plateau = PlateauScheduler(factor=tcfg.lr_factor, patience=tcfg.lr_patience,
                               threshold=tcfg.lr_threshold,
                               cooldown=tcfg.lr_cooldown)
    evaluate_every = evaluate_every or tcfg.evaluate_every_k_batches
    best_val = float("inf")
    vals_since_best = 0
    stop_early = False
    rng = jax.random.PRNGKey(tcfg.seed + 1)
    step = int(state.step)

    for epoch in range(num_epochs):
        t_epoch = time.time()
        for batch in train_batches():
            if mesh is None:
                mesh = mesh_lib.make_mesh(
                    cfg.mesh.num_devices,
                    batch_size=int(batch["images"].shape[0]))
                state = trainer.TrainState(
                    mesh_lib.replicate_pytree(state.params, mesh),
                    mesh_lib.replicate_pytree(state.opt_state, mesh),
                    jax.device_put(state.step, mesh_lib.replicated(mesh)))
            with mesh:
                rng, step_rng = jax.random.split(rng)
                sharded = mesh_lib.shard_pytree_batch(
                    {k: v for k, v in batch.items()
                     if isinstance(v, np.ndarray) or hasattr(v, "dtype")}, mesh)
                state, losses = step_fn(state, sharded, step_rng)
                step += 1

            if step % 50 == 0:
                writer.write_scalars(step, {f"train/{k}": float(v)
                                            for k, v in losses.items()})
            if val_fn is not None and step % evaluate_every == 0:
                # val_fn may return a scalar or a per-module loss dict
                # (the reference's val_losses_dict, evaluate_model.py:298);
                # "total" drives the plateau scheduler + best checkpoint
                val_out = val_fn(state)
                if isinstance(val_out, dict):
                    val_loss = float(val_out.get("total", 0.0))
                    writer.write_scalars(step, {f"val/{k}": float(v)
                                                for k, v in val_out.items()
                                                if k != "total"})
                else:
                    val_loss = float(val_out)
                prev_scale = plateau.scale
                scale = plateau.update(val_loss)
                if scale != prev_scale:
                    # apply ReduceLROnPlateau: rewrite the optimizer's LR
                    # multiplier in place (trainer.lr_scale_transform)
                    state = trainer.TrainState(
                        state.params,
                        trainer.set_lr_scale(
                            state.opt_state, scale,
                            mesh_lib.replicated(mesh) if mesh else None),
                        state.step)
                writer.write_scalars(step, {"val/loss": val_loss,
                                            "train/lr_scale": scale})
                if val_loss < best_val:
                    best_val = val_loss
                    vals_since_best = 0
                    save_checkpoint(os.path.join(run_dir, "best"), state)
                else:
                    vals_since_best += 1
                    if (tcfg.early_stop_patience is not None
                            and vals_since_best > tcfg.early_stop_patience):
                        log.info("early stop: %d validations without a new "
                                 "best (patience %d)", vals_since_best,
                                 tcfg.early_stop_patience)
                        stop_early = True
            if checkpoint_every and step % checkpoint_every == 0:
                save_checkpoint(os.path.join(run_dir, f"step_{step}"), state)
            if stop_early or (max_steps and step >= max_steps):
                break
        writer.write_scalars(step, {"train/epoch_seconds": time.time() - t_epoch,
                                    "train/epoch": epoch})
        if stop_early or (max_steps and step >= max_steps):
            break

    save_checkpoint(os.path.join(run_dir, "last"), state)
    writer.close()
    return state
