"""Training losses, mask-weighted static-shape formulations.

Loss definitions follow the reference exactly (which inherits torchvision's
Faster R-CNN losses and defines its own weighted BCEs / shifted CE):

  - RPN: BCE-with-logits objectness over 256 sampled anchors/img + smooth-L1
    (beta=1/9, sum) box loss over sampled positives, / num_sampled.
  - RoI: CE over 512 sampled proposals/img + smooth-L1 (beta=1/9, sum) over
    positives' matched-class deltas, / num_sampled.
  - selection/abnormal classifiers: BCEWithLogits(pos_weight=2.2 / 6.0)
    averaged over DETECTED regions only
    (binary_classifier_region_selection.py:36-40).
  - LM: shift-by-one CE ignoring pads, averaged over valid tokens of valid
    sequences (language_model.py:368-396), with sequence validity =
    class_detected & region_has_sentence (report_generation_model.py:78-80).

Dynamic candidate sets become boolean masks; dynamic normalizers stay exact
as traced scalars.
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp

from rgrg_tpu.core.config import DetectorConfig
from rgrg_tpu.models import gpt2
from rgrg_tpu.ops import boxes as box_ops
from rgrg_tpu.train import assign


def smooth_l1(pred: jnp.ndarray, target: jnp.ndarray, beta: float) -> jnp.ndarray:
    d = jnp.abs(pred - target)
    return jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray,
                    pos_weight: float = 1.0) -> jnp.ndarray:
    """Elementwise torch-style BCEWithLogits with pos_weight."""
    return (pos_weight * targets * jax.nn.softplus(-logits)
            + (1.0 - targets) * jax.nn.softplus(logits))


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    m = mask.astype(x.dtype)
    return jnp.sum(x * m) / jnp.maximum(jnp.sum(m), 1.0)


def rpn_loss(rng: jax.Array, objectness: jnp.ndarray, pred_deltas: jnp.ndarray,
             anchors: jnp.ndarray, gt_boxes: jnp.ndarray, gt_valid: jnp.ndarray,
             cfg: DetectorConfig) -> Dict[str, jnp.ndarray]:
    """Batched RPN loss.

    objectness: [B, N]; pred_deltas: [B, N, 4]; anchors: [N, 4];
    gt_boxes: [B, G, 4]; gt_valid: [B, G].
    """
    b = objectness.shape[0]
    rngs = jax.random.split(rng, b)

    def per_image(rng_i, obj, deltas, boxes, valid):
        m = assign.match_anchors(boxes, valid, anchors,
                                 cfg.rpn.fg_iou_thresh, cfg.rpn.bg_iou_thresh,
                                 allow_low_quality=True)
        labels = jnp.where(m.matched_idx >= 0, 1.0, 0.0)
        labels = jnp.where(m.matched_idx == assign.BETWEEN, -1.0, labels)
        matched_gt = boxes[jnp.maximum(m.matched_idx, 0)]
        reg_targets = box_ops.encode_boxes(matched_gt, anchors)

        pos, neg = assign.sample_pos_neg(rng_i, labels,
                                         cfg.rpn.batch_size_per_image,
                                         cfg.rpn.positive_fraction)
        sampled = pos | neg
        n_sampled = jnp.sum(sampled)
        box_l = jnp.sum(smooth_l1(deltas, reg_targets, 1.0 / 9.0)
                        * pos[:, None]) / jnp.maximum(n_sampled, 1)
        obj_l = masked_mean(bce_with_logits(obj, labels), sampled)
        return obj_l, box_l

    obj_l, box_l = jax.vmap(per_image)(rngs, objectness, pred_deltas,
                                       gt_boxes, gt_valid)
    # torchvision sums the per-image-normalized losses over the batch?
    # No: it concatenates all sampled indices across the batch and computes
    # ONE mean/sum over them. With a fixed 256 sample size per image the
    # batch-concat mean equals the mean of per-image means.
    return {"loss_objectness": jnp.mean(obj_l), "loss_rpn_box_reg": jnp.mean(box_l)}


class RoISamples(NamedTuple):
    proposals: jnp.ndarray   # [B, S, 4] sampled boxes (gt-augmented pool)
    labels: jnp.ndarray      # [B, S] int class labels (0 = background)
    reg_targets: jnp.ndarray  # [B, S, 4]
    sampled: jnp.ndarray     # [B, S] bool (rows beyond available candidates)
    pos: jnp.ndarray         # [B, S] bool


def select_training_samples(rng: jax.Array, proposals: jnp.ndarray,
                            proposal_valid: jnp.ndarray, gt_boxes: jnp.ndarray,
                            gt_labels: jnp.ndarray, gt_valid: jnp.ndarray,
                            cfg: DetectorConfig) -> RoISamples:
    """Static-shape RoIHeads.select_training_samples.

    proposals: [B, K, 4] RPN output; proposal_valid: [B, K] NMS keep mask;
    gt_*: [B, G, ...]. Appends gt boxes to the proposal pool (torchvision
    does), matches at 0.5/0.5, samples 512 @ 25% positive.

    Returns fixed-size samples: S = batch_size_per_image; unsampled rows are
    masked out by `sampled` (all-real rows in practice since negatives are
    abundant).
    """
    b, k, _ = proposals.shape
    s = cfg.roi.batch_size_per_image
    rngs = jax.random.split(rng, b)

    def per_image(rng_i, props, pvalid, boxes, labels_g, valid_g):
        pool = jnp.concatenate([props, boxes], axis=0)            # [K+G, 4]
        pool_valid = jnp.concatenate([pvalid, valid_g], axis=0)
        m = assign.match_anchors(boxes, valid_g, pool,
                                 cfg.roi.fg_iou_thresh, cfg.roi.bg_iou_thresh,
                                 allow_low_quality=False)
        clamped = jnp.maximum(m.matched_idx, 0)
        labels = labels_g[clamped].astype(jnp.float32)
        labels = jnp.where(m.matched_idx == assign.BELOW_LOW, 0.0, labels)
        labels = jnp.where(m.matched_idx == assign.BETWEEN, -1.0, labels)
        labels = jnp.where(pool_valid, labels, -1.0)  # padding rows: discard

        pos_m, neg_m = assign.sample_pos_neg(rng_i, labels,
                                             cfg.roi.batch_size_per_image,
                                             cfg.roi.positive_fraction)
        chosen = pos_m | neg_m
        # compact the chosen rows to the front, fixed size S
        order = jnp.argsort(jnp.where(chosen, 0, 1), stable=True)
        idx = order[:s]
        sampled = chosen[idx]
        sel_props = pool[idx]
        sel_labels = labels[idx].astype(jnp.int32)
        matched_gt = boxes[clamped[idx]]
        reg_t = box_ops.encode_boxes(matched_gt, sel_props,
                                     weights=cfg.roi.bbox_reg_weights)
        return RoISamples(sel_props, sel_labels, reg_t, sampled,
                          sampled & (sel_labels > 0))

    return jax.vmap(per_image)(rngs, proposals, proposal_valid,
                               gt_boxes, gt_labels, gt_valid)


def fastrcnn_loss(class_logits: jnp.ndarray, box_regression: jnp.ndarray,
                  samples: RoISamples) -> Dict[str, jnp.ndarray]:
    """class_logits: [B, S, C]; box_regression: [B, S, C*4]."""
    b, s, c = class_logits.shape
    labels = jnp.maximum(samples.labels, 0)
    logp = jax.nn.log_softmax(class_logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    cls_loss = masked_mean(nll, samples.sampled)

    reg = box_regression.reshape(b, s, c, 4)
    picked = jnp.take_along_axis(reg, labels[..., None, None].repeat(4, -1),
                                 axis=2)[:, :, 0, :]               # [B, S, 4]
    box_l = jnp.sum(smooth_l1(picked, samples.reg_targets, 1.0 / 9.0)
                    * samples.pos[..., None])
    box_loss = box_l / jnp.maximum(jnp.sum(samples.sampled), 1)
    return {"loss_classifier": cls_loss, "loss_box_reg": box_loss}


def classifier_loss(logits: jnp.ndarray, targets: jnp.ndarray,
                    class_detected: jnp.ndarray, pos_weight: float) -> jnp.ndarray:
    """Weighted BCE over detected regions only. logits/targets/detected: [B, 29]."""
    el = bce_with_logits(logits, targets.astype(logits.dtype), pos_weight)
    return masked_mean(el, class_detected)


def lm_loss_selected(decoder_params, input_ids: jnp.ndarray,
                     attention_mask: jnp.ndarray, region_features: jnp.ndarray,
                     seq_valid: jnp.ndarray, cfg, budget: int,
                     precision=None, dropout_rng=None,
                     remat: bool = False) -> jnp.ndarray:
    """LM loss over the compacted set of valid region sequences.

    input_ids/attention_mask: [B, 29, S]; region_features: [B, 29, F];
    seq_valid: [B, 29] (class_detected & region_has_sentence). Compacts valid
    sequences to `budget` rows (original order), computes shift-CE averaged
    over valid tokens — identical to the reference's CrossEntropyLoss over
    the dynamically-filtered batch when budget >= count.
    """
    b, r, s = input_ids.shape
    flat_ids = input_ids.reshape(b * r, s)
    flat_mask = attention_mask.reshape(b * r, s)
    flat_feats = region_features.reshape(b * r, -1)
    flat_valid = seq_valid.reshape(b * r)

    order = jnp.argsort(jnp.where(flat_valid, 0, 1), stable=True)
    idx = order[:budget]
    active = flat_valid[idx]

    ids = flat_ids[idx]
    mask = flat_mask[idx] * active[:, None].astype(flat_mask.dtype)
    feats = flat_feats[idx]

    logits = gpt2.forward_full(decoder_params, ids, mask, feats, cfg, precision,
                               dropout_rng=dropout_rng, remat=remat)
    shift_logits = logits[:, :-1, :].astype(jnp.float32)
    shift_labels = ids[:, 1:]
    shift_valid = mask[:, 1:].astype(bool)

    # CE as logsumexp - picked logit: avoids materializing the full [N,S,V]
    # log-softmax tensor (the vocab-wide logp was the single largest training
    # activation at V=50257); identical value and gradient.
    lse = jax.nn.logsumexp(shift_logits, axis=-1)
    picked = jnp.take_along_axis(shift_logits, shift_labels[..., None],
                                 axis=-1)[..., 0]
    nll = jnp.where(shift_valid, lse - picked, 0.0)
    return jnp.sum(nll) / jnp.maximum(jnp.sum(shift_valid), 1)
