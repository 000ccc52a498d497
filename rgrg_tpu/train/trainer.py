"""Train steps for the 3-stage RGRG protocol, pjit data-parallel.

Stages (reference README_TRAIN_TEST.md / run_configurations.py:11-28):
  1: object detector alone (losses: rpn objectness/box + roi cls/box)
  2: detector + both binary classifiers (PRETRAIN_WITHOUT_LM_MODEL)
  3: full model incl. language model (GPT-2 base frozen; uk/uv +
     feature-space transform + detector/classifiers train)

Weighted total (run_configurations.py:58-61): detector 1, selection 5,
abnormal 5, LM 2.

The GPT-2 freeze is an optimizer partition (optax.multi_transform with
set_to_zero on the frozen subtree) — the forward is identical either way,
exactly like the reference's requires_grad=False.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from rgrg_tpu.core.config import ModelConfig, TrainConfig
from rgrg_tpu.models.full_model import RGRG
from rgrg_tpu.train import losses as L


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def decoder_trainable_mask(decoder_params: Dict[str, Any]) -> Dict[str, Any]:
    """True for uk/uv and feature_transform; False for the frozen GPT-2 base
    (language_model.py:208-209 freezes everything, then adds trainable
    uk/uv + the feature-space MLP)."""
    def mark(path, _):
        keys = [str(getattr(p, "key", p)) for p in path]
        if "feature_transform" in keys:
            return True
        return "uk" in keys or "uv" in keys

    return jax.tree_util.tree_map_with_path(mark, decoder_params)


def trainable_mask(params: Dict[str, Any], stage: int) -> Dict[str, Any]:
    def det_mark(path, _):
        # batch_stats update through the BN mutable mechanism, never the
        # optimizer (adamw's weight decay would corrupt them otherwise)
        keys = [str(getattr(p, "key", p)) for p in path]
        return "batch_stats" not in keys

    mask = {
        "detector": jax.tree_util.tree_map_with_path(det_mark, params["detector"]),
        "decoder": jax.tree.map(lambda _: False, params["decoder"]),
    }
    if stage >= 3:
        mask["decoder"] = decoder_trainable_mask(params["decoder"])
    return mask


class LRScaleState(NamedTuple):
    """State of the dynamic LR multiplier (ReduceLROnPlateau's knob)."""
    scale: jnp.ndarray


def lr_scale_transform() -> optax.GradientTransformation:
    """Multiplies the final updates by a runtime-adjustable scalar.

    optax.adamw's update is linear in the learning rate (both the
    Adam step and the decoupled weight-decay term carry the lr factor),
    so scaling the updates by s is exactly equivalent to using lr*s —
    this is how ReduceLROnPlateau (reference
    training_script_object_detector.py:621, train_full_model.py) takes
    effect without rebuilding the optimizer. The loop mutates the scale
    via set_lr_scale()."""
    def init_fn(params):
        del params
        return LRScaleState(jnp.ones((), jnp.float32))

    def update_fn(updates, state, params=None):
        del params
        scaled = jax.tree.map(lambda u: u * state.scale.astype(u.dtype), updates)
        return scaled, state

    return optax.GradientTransformation(init_fn, update_fn)


def set_lr_scale(opt_state, scale, sharding=None):
    """Returns opt_state with every LRScaleState leaf set to `scale`
    (handles nesting under MultiSteps/multi_transform transparently)."""
    new = jnp.asarray(scale, jnp.float32)
    if sharding is not None:
        new = jax.device_put(new, sharding)

    def repl(node):
        return LRScaleState(new) if isinstance(node, LRScaleState) else node

    return jax.tree_util.tree_map(
        repl, opt_state, is_leaf=lambda x: isinstance(x, LRScaleState))


def get_lr_scale(opt_state) -> float:
    """Reads the current LR scale out of the optimizer state."""
    out = []

    def visit(node):
        if isinstance(node, LRScaleState):
            out.append(float(node.scale))
        return node

    jax.tree_util.tree_map(visit, opt_state,
                           is_leaf=lambda x: isinstance(x, LRScaleState))
    if not out:
        raise ValueError("no LRScaleState in opt_state")
    return out[0]


def make_optimizer(params: Dict[str, Any], tcfg: TrainConfig, stage: int,
                   learning_rate: Optional[float] = None) -> optax.GradientTransformation:
    lr = learning_rate if learning_rate is not None else (
        tcfg.detector_learning_rate if stage == 1 else tcfg.learning_rate)
    mask = trainable_mask(params, stage)
    opt = optax.chain(
        optax.multi_transform(
            {"train": optax.adamw(lr, weight_decay=tcfg.weight_decay),
             "frozen": optax.set_to_zero()},
            jax.tree.map(lambda t: "train" if t else "frozen", mask)),
        lr_scale_transform())
    if tcfg.grad_accumulation_steps > 1:
        opt = optax.MultiSteps(opt, tcfg.grad_accumulation_steps)
    return opt


def compute_losses(model: RGRG, params: Dict[str, Any], batch: Dict[str, Any],
                   rng: jax.Array, stage: int, tcfg: TrainConfig,
                   lm_budget: int, precision=None, train: bool = True,
                   mixed_precision: bool = False, remat_decoder: bool = False):
    """Returns (total, loss dict, new batch_stats).

    train=False gives torch eval() loss semantics (the reference computes
    validation losses under model.eval() with losses enabled by the custom
    RPN/RoI, custom_rpn.py:14-24 / training_script_object_detector.py:210-286):
    BN uses running stats (and batch_stats are NOT updated) and dropout is
    off, so the same batch always yields the same loss. The fg/bg proposal
    sampling rng still applies in both modes — torch's fg_bg_sampler uses
    randperm regardless of the training flag.

    mixed_precision=True casts the decoder's f32 params to bf16 for the
    forward (masters stay f32 in the optimizer; astype's transpose returns
    f32 grads) — the TPU analog of the reference's fp16 AMP autocast
    (train_full_model.py:172,211). remat_decoder checkpoints each GPT-2
    block (see gpt2.forward_full). Both matter only for the full-scale
    24x1024 decoder; detector mixed precision is the DetectorConfig.dtype
    knob instead (flax compute dtype)."""
    det = model.detector
    variables = params["detector"]
    rng_det, rng_drop = jax.random.split(rng)
    (det_losses, aux), mutated = det.apply(
        variables, batch["images"], batch["gt_boxes"], batch["gt_labels"],
        batch["gt_valid"], rng_det, method=det.train_forward,
        bn_train=train, mutable=["batch_stats"])

    losses = dict(det_losses)
    total = tcfg.loss_weight_detector * sum(det_losses.values())

    if stage >= 2:
        sel_loss = L.classifier_loss(
            aux["selection_logits"], batch["region_has_sentence"],
            aux["class_detected"], model.cfg.classifier.selection_pos_weight)
        abn_loss = L.classifier_loss(
            aux["abnormal_logits"], batch["region_is_abnormal"],
            aux["class_detected"], model.cfg.classifier.abnormal_pos_weight)
        losses["loss_selection"] = sel_loss
        losses["loss_abnormal"] = abn_loss
        total = (total + tcfg.loss_weight_selection * sel_loss
                 + tcfg.loss_weight_abnormal * abn_loss)

    if stage >= 3:
        seq_valid = aux["class_detected"] & batch["region_has_sentence"].astype(bool)
        dec_params = params["decoder"]
        # requires_grad=False on the GPT-2 base (language_model.py:208-209):
        # stop_gradient skips the dW matmuls for frozen weights (the
        # activation-gradient flow to uk/uv/feature_transform is unaffected);
        # the optimizer's set_to_zero partition already discards these grads,
        # so this only removes dead backward work, never changes updates.
        tmask = decoder_trainable_mask(dec_params)
        dec_params = jax.tree.map(
            lambda p, t: p if t else jax.lax.stop_gradient(p), dec_params, tmask)
        if mixed_precision:
            dec_params = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if x.dtype == jnp.float32 else x, dec_params)
        lm = L.lm_loss_selected(dec_params, batch["input_ids"],
                                batch["attention_mask"], aux["region_features"],
                                seq_valid, model.cfg.decoder, lm_budget,
                                precision=precision,
                                dropout_rng=rng_drop if train else None,
                                remat=remat_decoder)
        losses["loss_lm"] = lm
        total = total + tcfg.loss_weight_lm * lm

    losses["loss_total"] = total
    return total, losses, mutated.get("batch_stats") if train else None


def make_train_step(model: RGRG, tcfg: TrainConfig, optimizer,
                    stage: int = 3, lm_budget: int = 128, precision=None,
                    mixed_precision: bool = False, remat_decoder: bool = False):
    """Builds a jitted DP train step.

    batch leaves are sharded over the mesh "data" axis by the caller
    (core.mesh.shard_pytree_batch); params replicated. XLA inserts the
    gradient all-reduce.
    """

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch: Dict[str, Any], rng: jax.Array):
        def loss_fn(params):
            total, losses, new_stats = compute_losses(
                model, params, batch, rng, stage, tcfg, lm_budget, precision,
                mixed_precision=mixed_precision, remat_decoder=remat_decoder)
            return total, (losses, new_stats)

        grads, (losses, new_stats) = jax.grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        if new_stats is not None:
            params = dict(params)
            params["detector"] = dict(params["detector"])
            params["detector"]["batch_stats"] = new_stats
        return TrainState(params, opt_state, state.step + 1), losses

    return train_step


def init_train_state(model: RGRG, rng: jax.Array, tcfg: TrainConfig,
                     stage: int = 3, learning_rate: Optional[float] = None):
    params = model.init(rng)
    optimizer = make_optimizer(params, tcfg, stage, learning_rate)
    opt_state = optimizer.init(params)
    return TrainState(params, opt_state, jnp.zeros((), jnp.int32)), optimizer
