"""TPU-native anatomical-region detector.

Re-designs the reference Faster R-CNN pipeline (object_detector.py,
custom_rpn.py, custom_roi_heads.py) with static shapes end to end:

  - the RPN keeps a FIXED top-k proposal set (1000 eval / 2000 train) with a
    validity mask instead of dynamically compacting after NMS;
  - the "class not detected" early-exit logic of the reference becomes a
    boolean `class_detected` mask carried through (no data-dependent shapes);
  - top-1-per-class decoding (custom_roi_heads.py:63-208) is a pure
    argmax/gather over [B, K, 29] score tensors — fully vectorized, no
    per-image Python loop;
  - the region-selection / region-abnormal binary classifiers are fused into
    the same jitted forward (reference keeps them as separate modules).

Everything here is a flax module tree + pure functions; the public entry
points are `RegionDetector.__call__` (train/eval) and the standalone
`filter_proposals` / `top1_per_class`, which are also reused by the
user-box ("selection-based generation") API.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from rgrg_tpu.core import constants as C
from rgrg_tpu.core.config import DetectorConfig
from rgrg_tpu.ops import anchors as anchors_lib
from rgrg_tpu.ops import boxes as box_ops
from rgrg_tpu.ops import nms as nms_lib
from rgrg_tpu.ops.roi_align import roi_align, roi_align_fused_batched
from rgrg_tpu.models.heads import (
    BinaryClassifierMLP, FastRCNNPredictor, RPNHead, TwoMLPHead)
from rgrg_tpu.models.resnet import ResNetBackbone


def filter_proposals(proposals: jnp.ndarray, objectness: jnp.ndarray,
                     cfg: DetectorConfig, train: bool):
    """Static-shape equivalent of torchvision RPN.filter_proposals for a
    single image: top-k by objectness -> clip -> small-box mask -> NMS.

    proposals: [N, 4]; objectness: [N] logits.
    Returns (boxes [K, 4] score-sorted, keep [K] bool, scores [K] logits).
    """
    k = cfg.rpn.pre_nms_top_n(train)
    top_scores, idx = jax.lax.top_k(objectness, k)
    boxes = proposals[idx]
    boxes = box_ops.clip_boxes_to_image(boxes, cfg.image_size, cfg.image_size)
    valid = box_ops.remove_small_boxes_mask(boxes, cfg.rpn.min_box_size)
    # score_thresh is 0.0 and scores are sigmoid outputs (> 0): no-op filter
    if cfg.use_pallas_nms:
        from rgrg_tpu.ops.nms_pallas import nms_keep_mask_pallas
        keep = nms_keep_mask_pallas(boxes, valid, cfg.rpn.nms_thresh)
    else:
        keep = nms_lib.nms_keep_mask_tiled(boxes, valid, cfg.rpn.nms_thresh)
    # post_nms_top_n == pre_nms_top_n in the reference config, so the kept
    # mask needs no further truncation.
    return boxes, keep, top_scores


def top1_per_class(class_logits: jnp.ndarray, valid: jnp.ndarray,
                   num_regions: int = C.NUM_REGIONS):
    """Vectorized top-1-per-class decoding (custom_roi_heads.py:141-196).

    class_logits: [K, 1+num_regions] (col 0 = background); valid: [K] bool.
    Returns dict with:
      class_detected [R] bool, top_idx [R] int (proposal index per region,
      0 when undetected, as in the reference), top_scores [R].
    """
    pred_scores = jax.nn.softmax(class_logits, axis=-1)[:, 1:]  # [K, R]
    pred_classes = jnp.argmax(pred_scores, axis=-1)             # [K]
    onehot = jax.nn.one_hot(pred_classes, num_regions, dtype=pred_scores.dtype)
    onehot = onehot * valid[:, None].astype(pred_scores.dtype)
    masked = pred_scores * onehot                               # [K, R]
    top_scores = jnp.max(masked, axis=0)                        # [R]
    top_idx = jnp.argmax(masked, axis=0)                        # [R]
    class_detected = jnp.sum(onehot, axis=0) > 0
    return {"class_detected": class_detected, "top_idx": top_idx,
            "top_scores": top_scores}


class RegionDetector(nn.Module):
    """Backbone + RPN + RoI heads + fused binary-classifier heads.

    __call__ returns a dict of static-shape tensors; no early returns — the
    reference's `-1` sentinel for "nothing selected" becomes an all-False
    `selected_regions` mask (SURVEY.md §5 failure-detection mapping).
    """

    cfg: DetectorConfig = DetectorConfig()

    def setup(self):
        dtype = jnp.dtype(self.cfg.dtype)
        self.backbone = ResNetBackbone(stage_sizes=self.cfg.backbone_stages,
                                       in_channels=1, dtype=dtype)
        self.rpn_head = RPNHead(in_channels=C.BACKBONE_CHANNELS,
                                num_anchors=self.cfg.anchors.num_anchors_per_location,
                                dtype=dtype)
        self.box_head = TwoMLPHead(self.cfg.roi.representation_size, dtype=dtype)
        self.box_predictor = FastRCNNPredictor(self.cfg.num_classes, dtype=dtype)
        self.dim_reduction = nn.Dense(C.REGION_FEATURE_DIM, dtype=dtype)
        self.selection_classifier = BinaryClassifierMLP()
        self.abnormal_classifier = BinaryClassifierMLP()

    def backbone_features(self, images: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """images: [B, H, W, 1] NHWC -> C5 features [B, 16, 16, 2048]."""
        return self.backbone(images, train=train)

    def rpn_proposals(self, feats: jnp.ndarray, train: bool = False):
        """feats -> (boxes [B, K, 4], keep [B, K], rpn raw outputs)."""
        objectness, deltas = self.rpn_head(feats)
        # box math always runs in f32: bf16 resolution (~2px at coord 512)
        # would corrupt proposal geometry and NMS decisions
        objectness = objectness.astype(jnp.float32)
        deltas = deltas.astype(jnp.float32)
        anchors = jnp.asarray(anchors_lib.grid_anchors(self.cfg.anchors))
        proposals = box_ops.decode_boxes(
            jax.lax.stop_gradient(deltas), anchors)[..., 0, :]  # [B, N, 4]
        boxes, keep, scores = jax.vmap(
            lambda p, o: filter_proposals(p, o, self.cfg, train))(
                proposals, jax.lax.stop_gradient(objectness))
        return boxes, keep, (objectness, deltas, anchors)

    def _pool_batch_fn(self):
        """RoIAlign implementation picked by cfg.roi_align_impl.

        Auto (None): the fused outer-product matmul for bf16 compute — 5.2x
        the separable 2-einsum at serving chunk shapes (its [B, N, P, W, C]
        HBM intermediate is the cost; docs/artifacts/
        roi_pooled_formulations.json) — and the separable form for f32,
        whose two HIGHEST-precision einsums reproduce torchvision's exact
        associativity (ops/roi_align.py docstring).
        """
        impl = self.cfg.roi_align_impl
        if impl is None:
            impl = ("fused" if jnp.dtype(self.cfg.dtype) == jnp.bfloat16
                    else "separable")
        kw = dict(output_size=self.cfg.roi.output_size,
                  spatial_scale=1.0 / C.BACKBONE_STRIDE,
                  sampling_ratio=self.cfg.roi.sampling_ratio)
        if impl == "pallas":
            from rgrg_tpu.ops.roi_align_pallas import roi_align_pallas_batched
            return lambda f, bx: roi_align_pallas_batched(f, bx, **kw)
        if impl == "fused":
            return lambda f, bx: roi_align_fused_batched(
                f, bx, compute_dtype=jnp.dtype(self.cfg.dtype), **kw)
        if impl != "separable":
            raise ValueError(f"unknown roi_align_impl: {impl!r}")
        return lambda f, bx: jax.vmap(lambda fi, bi: roi_align(
            fi, bi, compute_dtype=jnp.dtype(self.cfg.dtype), **kw))(f, bx)

    def roi_forward(self, feats: jnp.ndarray, boxes: jnp.ndarray):
        """RoIAlign + box head for a batch of padded proposal boxes.

        feats: [B, 16, 16, 2048]; boxes: [B, K, 4].
        Returns (class_logits [B,K,30], box_regression [B,K,120],
                 box_features [B,K,2048] spatially averaged).

        Proposals run in chunks so the pooled [*, 8, 8, 2048] maps (the
        detector's largest intermediate: ~0.26 MB/proposal f32) never
        materialize for all B*K proposals at once. (A fused
        RoIAlign+avgpool+fc6 Pallas kernel — 16% faster standalone — was
        removed after it kept faulting at runtime inside the full graph on
        v5e; see git history at ops/roi_fc6_pallas.py for the kernel and
        the isolation notes.)
        """
        b, k, _ = boxes.shape
        chunk = min(self.cfg.roi.proposal_chunk, k)
        _pool_batch = self._pool_batch_fn()
        outs = []
        for start in range(0, k, chunk):
            sl = boxes[:, start:start + chunk]
            pooled = _pool_batch(feats, sl)
            box_vecs = self.box_head(pooled)               # [B, c, 1024]
            cls, reg = self.box_predictor(box_vecs)
            feats_avg = pooled.mean(axis=(-3, -2))         # [B, c, 2048]
            outs.append((cls.astype(jnp.float32), reg.astype(jnp.float32),
                         feats_avg.astype(jnp.float32)))
        class_logits = jnp.concatenate([o[0] for o in outs], axis=1)
        box_regression = jnp.concatenate([o[1] for o in outs], axis=1)
        box_features = jnp.concatenate([o[2] for o in outs], axis=1)
        return class_logits, box_regression, box_features

    def region_features_from_boxes(self, feats: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
        """Arbitrary user boxes -> 1024-d region features (the
        'selection-based generation' API; evaluate_bbox_variations.py:92-109
        RoI-pools given boxes directly, bypassing the RPN).

        feats: [B, 16, 16, 2048]; boxes: [B, N, 4] -> [B, N, 1024].
        """
        pooled = self._pool_batch_fn()(feats, boxes)
        box_features = pooled.mean(axis=(-3, -2))
        return self.dim_reduction(box_features).astype(jnp.float32)

    def train_forward(self, images: jnp.ndarray, gt_boxes: jnp.ndarray,
                      gt_labels: jnp.ndarray, gt_valid: jnp.ndarray,
                      rng: jax.Array, bn_train: bool = True):
        """Training forward: losses + per-region features.

        Mirrors the reference train path (custom_roi_heads.py:225-258): the
        RoI head runs on the 512 SAMPLED proposals (gt-augmented), and
        top-1-per-class / region features are computed from those samples.

        bn_train=False gives the reference's eval-with-targets semantics
        (model.eval() + losses enabled by the custom RPN/RoI,
        custom_rpn.py:14-24): BN running stats, eval RPN top-n (1000 vs
        2000), but proposal sampling still runs — the reference's
        select_training_samples executes whenever targets are given
        (custom_roi_heads.py:225-226).

        gt_boxes: [B, G, 4]; gt_labels: [B, G] int (1..29); gt_valid: [B, G].
        Returns (losses dict, aux dict with region_features [B,29,1024],
        class_detected [B,29], selection/abnormal logits).
        """
        from rgrg_tpu.train import losses as L  # local import to avoid cycle

        r_rpn, r_roi = jax.random.split(rng)
        feats = self.backbone_features(images, train=bn_train)
        boxes, keep, (objectness, deltas, anchors) = self.rpn_proposals(
            feats, train=bn_train)

        rpn_losses = L.rpn_loss(r_rpn, objectness, deltas, anchors,
                                gt_boxes, gt_valid, self.cfg)

        samples = L.select_training_samples(
            r_roi, boxes, keep, gt_boxes, gt_labels, gt_valid, self.cfg)
        class_logits, box_regression, box_features = self.roi_forward(
            feats, samples.proposals)
        roi_losses = L.fastrcnn_loss(class_logits, box_regression, samples)

        sel = jax.vmap(top1_per_class)(class_logits, samples.sampled)
        top_features = jax.vmap(lambda f, i: f[i])(box_features, sel["top_idx"])
        region_features = self.dim_reduction(top_features)
        selection_logits = self.selection_classifier(region_features)
        abnormal_logits = self.abnormal_classifier(region_features)

        losses = {**rpn_losses, **roi_losses}
        aux = {
            "region_features": region_features,
            "class_detected": sel["class_detected"],
            "selection_logits": selection_logits,
            "abnormal_logits": abnormal_logits,
        }
        return losses, aux

    def __call__(self, images: jnp.ndarray, train: bool = False,
                 logit_threshold: float = -1.0):
        """Inference/eval forward.

        images: [B, H, W, 1] normalized grayscale.
        Returns dict:
          top_region_boxes   [B, 29, 4]
          top_scores         [B, 29]
          class_detected     [B, 29] bool
          region_features    [B, 29, 1024]  (dim-reduced)
          selection_logits   [B, 29]
          abnormal_logits    [B, 29]
          selected_regions   [B, 29] bool (selection > thr, masked by detected)
          predicted_abnormal [B, 29] bool
        """
        feats = self.backbone_features(images, train=train)
        boxes, keep, _ = self.rpn_proposals(feats, train=False)

        budget = self.cfg.roi.inference_proposal_budget
        if budget is not None and budget < boxes.shape[1]:
            # compact NMS survivors to the front (score order preserved) and
            # run the RoI head on the first `budget` slots only
            def compact(bx, kp):
                order = jnp.argsort(jnp.where(kp, 0, 1), stable=True)[:budget]
                return bx[order], kp[order]

            boxes, keep = jax.vmap(compact)(boxes, keep)

        class_logits, box_regression, box_features = self.roi_forward(
            feats, boxes)

        sel = jax.vmap(top1_per_class)(class_logits, keep)
        class_detected = sel["class_detected"]                       # [B, 29]
        top_idx = sel["top_idx"]                                     # [B, 29]

        # decoded per-class boxes, clip, drop background, gather top per class
        decoded = box_ops.decode_boxes(
            box_regression, boxes, weights=self.cfg.roi.bbox_reg_weights)  # [B,K,30,4]
        decoded = box_ops.clip_boxes_to_image(decoded, self.cfg.image_size,
                                              self.cfg.image_size)
        decoded = decoded[..., 1:, :]                                # [B,K,29,4]
        region_ids = jnp.arange(C.NUM_REGIONS)
        top_boxes = jax.vmap(lambda d, i: d[i, region_ids])(decoded, top_idx)

        top_features = jax.vmap(lambda f, i: f[i])(box_features, top_idx)  # [B,29,2048]
        region_features = self.dim_reduction(top_features)           # [B,29,1024]

        selection_logits = self.selection_classifier(region_features)
        abnormal_logits = self.abnormal_classifier(region_features)
        selected_regions = (selection_logits > logit_threshold) & class_detected
        predicted_abnormal = abnormal_logits > logit_threshold

        return {
            "top_region_boxes": top_boxes,
            "top_scores": sel["top_scores"],
            "class_detected": class_detected,
            "region_features": region_features,
            "selection_logits": selection_logits,
            "abnormal_logits": abnormal_logits,
            "selected_regions": selected_regions,
            "predicted_abnormal": predicted_abnormal,
        }
