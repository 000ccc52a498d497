"""Detector pipeline tests: RPN layout vs torch, end-to-end inference path
vs an independent numpy oracle of the reference semantics."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as tF

from rgrg_tpu.core.config import DetectorConfig, RPNConfig
from rgrg_tpu.models.detector import RegionDetector, top1_per_class
from rgrg_tpu.models.heads import RPNHead
from rgrg_tpu.core.torch_convert import conv_kernel
from rgrg_tpu.ops import anchors as anchors_lib

from tests.oracles import decode_boxes_oracle, nms_oracle, roi_align_oracle_fast

SMALL_CFG = DetectorConfig(rpn=RPNConfig(
    pre_nms_top_n_test=64, post_nms_top_n_test=64,
    pre_nms_top_n_train=96, post_nms_top_n_train=96))


def test_rpn_head_layout_matches_torch():
    """Flattened (y, x, anchor) ordering must equal torchvision's
    permute_and_flatten on NCHW conv outputs."""
    a, ch, hw = 6, 32, 5
    tconv = torch.nn.Conv2d(ch, ch, 3, padding=1)
    tcls = torch.nn.Conv2d(ch, a, 1)
    tbox = torch.nn.Conv2d(ch, a * 4, 1)
    x = torch.randn(2, ch, hw, hw)
    with torch.no_grad():
        t = tF.relu(tconv(x))
        obj_t = tcls(t)   # [B, A, H, W]
        del_t = tbox(t)   # [B, 4A, H, W]
    # torchvision permute_and_flatten semantics
    want_obj = obj_t.permute(0, 2, 3, 1).reshape(2, -1).numpy()
    want_del = (del_t.view(2, a, 4, hw, hw).permute(0, 3, 4, 1, 2)
                .reshape(2, -1, 4).numpy())

    head = RPNHead(in_channels=ch, num_anchors=a)
    params = {"params": {
        "conv": {"kernel": jnp.asarray(conv_kernel(tconv.weight.detach().numpy())),
                 "bias": jnp.asarray(tconv.bias.detach().numpy())},
        "cls_logits": {"kernel": jnp.asarray(conv_kernel(tcls.weight.detach().numpy())),
                       "bias": jnp.asarray(tcls.bias.detach().numpy())},
        "bbox_pred": {"kernel": jnp.asarray(conv_kernel(tbox.weight.detach().numpy())),
                      "bias": jnp.asarray(tbox.bias.detach().numpy())},
    }}
    got_obj, got_del = head.apply(params, jnp.asarray(
        x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got_obj), want_obj, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_del), want_del, rtol=1e-4, atol=1e-5)


class TestEndToEnd:
    """Run the real RegionDetector (random weights) and replay the reference
    decision logic in numpy from the same intermediate tensors."""

    @classmethod
    def setup_class(cls):
        cls.cfg = SMALL_CFG
        cls.det = RegionDetector(cfg=cls.cfg)
        rng = jax.random.PRNGKey(3)
        img = jax.random.normal(jax.random.PRNGKey(1), (1, 512, 512, 1)) * 0.5
        cls.variables = cls.det.init(rng, img, train=False)
        cls.img = img
        cls.out = cls.det.apply(cls.variables, img, train=False)
        cls.feats = cls.det.apply(cls.variables, img, train=False,
                                  method=cls.det.backbone_features)
        boxes, keep, raw = cls.det.apply(cls.variables, cls.feats,
                                         method=cls.det.rpn_proposals)
        cls.boxes, cls.keep = np.asarray(boxes), np.asarray(keep)
        cls.objectness = np.asarray(raw[0])
        cls.deltas = np.asarray(raw[1])
        cls.anchors = np.asarray(raw[2])

    def _oracle_proposals(self):
        obj = self.objectness[0].astype(np.float64)
        k = self.cfg.rpn.pre_nms_top_n(False)
        order = np.argsort(-obj, kind="stable")[:k]
        props = decode_boxes_oracle(self.deltas[0], self.anchors)[order, 0]
        props = np.clip(props, 0.0, 512.0)
        scores = obj[order]
        ws = props[:, 2] - props[:, 0]
        hs = props[:, 3] - props[:, 1]
        valid = (ws >= 1e-3) & (hs >= 1e-3)
        vb, vs = props[valid], scores[valid]
        kept_local = nms_oracle(vb, vs, self.cfg.rpn.nms_thresh)
        return vb[kept_local], props, valid

    def test_proposals_match_oracle(self):
        want_kept, props, valid = self._oracle_proposals()
        got_kept = self.boxes[0][self.keep[0]]
        assert got_kept.shape == want_kept.shape
        np.testing.assert_allclose(got_kept, want_kept, rtol=1e-4, atol=5e-3)

    def test_full_pipeline_matches_oracle(self):
        p = self.variables["params"]
        kept_boxes, _, _ = self._oracle_proposals()
        n = kept_boxes.shape[0]

        pooled = roi_align_oracle_fast(np.asarray(self.feats[0], np.float64),
                                       kept_boxes, 8, 1 / 32.0, 2)
        flat = pooled.reshape(n, -1)
        relu = lambda v: np.maximum(v, 0)  # noqa: E731
        vec = relu(relu(flat @ np.asarray(p["box_head"]["fc6"]["kernel"], np.float64)
                        + np.asarray(p["box_head"]["fc6"]["bias"]))
                   @ np.asarray(p["box_head"]["fc7"]["kernel"], np.float64)
                   + np.asarray(p["box_head"]["fc7"]["bias"]))
        cls_logits = vec @ np.asarray(p["box_predictor"]["cls_score"]["kernel"], np.float64) \
            + np.asarray(p["box_predictor"]["cls_score"]["bias"])
        box_reg = vec @ np.asarray(p["box_predictor"]["bbox_pred"]["kernel"], np.float64) \
            + np.asarray(p["box_predictor"]["bbox_pred"]["bias"])

        # reference top-1-per-class decision logic (custom_roi_heads.py:141-196)
        e = np.exp(cls_logits - cls_logits.max(axis=1, keepdims=True))
        scores = (e / e.sum(axis=1, keepdims=True))[:, 1:]
        pred_classes = scores.argmax(axis=1)
        onehot = np.eye(29)[pred_classes]
        masked = scores * onehot
        want_top_scores = masked.max(axis=0)
        want_idx = masked.argmax(axis=0)
        want_detected = onehot.sum(axis=0) > 0

        got = self.out
        np.testing.assert_array_equal(np.asarray(got["class_detected"][0]), want_detected)
        np.testing.assert_allclose(np.asarray(got["top_scores"][0]), want_top_scores,
                                   rtol=1e-3, atol=1e-4)

        # detections: decode, clip, drop bg, per-class gather
        dec = decode_boxes_oracle(box_reg, kept_boxes, weights=(10, 10, 5, 5))
        dec = np.clip(dec, 0, 512)[:, 1:, :]
        want_boxes = dec[want_idx, np.arange(29)]
        got_boxes = np.asarray(got["top_region_boxes"][0])
        np.testing.assert_allclose(got_boxes[want_detected], want_boxes[want_detected],
                                   rtol=1e-3, atol=5e-2)

        # region features: avg-pool 8x8 -> gather -> dim_reduction
        box_feats = pooled.mean(axis=(1, 2))
        top_feats = box_feats[want_idx]
        want_region = top_feats @ np.asarray(p["dim_reduction"]["kernel"], np.float64) \
            + np.asarray(p["dim_reduction"]["bias"])
        got_region = np.asarray(got["region_features"][0])
        np.testing.assert_allclose(got_region[want_detected], want_region[want_detected],
                                   rtol=1e-3, atol=1e-3)

        # classifier logits over region features
        def mlp(f, x):
            h = relu(x @ np.asarray(f["fc0"]["kernel"], np.float64) + np.asarray(f["fc0"]["bias"]))
            h = relu(h @ np.asarray(f["fc1"]["kernel"], np.float64) + np.asarray(f["fc1"]["bias"]))
            return (h @ np.asarray(f["fc2"]["kernel"], np.float64) + np.asarray(f["fc2"]["bias"]))[:, 0]

        want_sel = mlp(p["selection_classifier"], want_region)
        got_sel = np.asarray(got["selection_logits"][0])
        np.testing.assert_allclose(got_sel[want_detected], want_sel[want_detected],
                                   rtol=1e-3, atol=1e-3)
        want_selected = (want_sel > -1.0) & want_detected
        np.testing.assert_array_equal(np.asarray(got["selected_regions"][0])[want_detected],
                                      want_selected[want_detected])

    def test_output_shapes(self):
        out = self.out
        assert out["top_region_boxes"].shape == (1, 29, 4)
        assert out["region_features"].shape == (1, 29, 1024)
        assert out["class_detected"].dtype == jnp.bool_
        assert out["selected_regions"].shape == (1, 29)


def test_roi_forward_impl_equivalence():
    """roi_forward is numerically impl-independent in f32: the fused
    outer-product RoIAlign (serving default for bf16) and the separable
    parity form feed identical features to the box head."""
    cfg = dataclasses.replace(SMALL_CFG, backbone_stages=(1, 1, 1, 1))
    det = RegionDetector(cfg=cfg)
    img = jax.random.normal(jax.random.PRNGKey(5), (2, 512, 512, 1)) * 0.5
    variables = det.init(jax.random.PRNGKey(4), img, train=False)
    feats = det.apply(variables, img, train=False,
                      method=det.backbone_features)
    x1 = jax.random.uniform(jax.random.PRNGKey(6), (2, 16), maxval=480.0)
    y1 = jax.random.uniform(jax.random.PRNGKey(7), (2, 16), maxval=480.0)
    boxes = jnp.stack([x1, y1, x1 + 30.0, y1 + 25.0], axis=-1)
    outs = {}
    for impl in ("separable", "fused"):
        d = RegionDetector(cfg=dataclasses.replace(cfg, roi_align_impl=impl))
        outs[impl] = d.apply(variables, feats, boxes, method=d.roi_forward)
    for a, b in zip(outs["separable"], outs["fused"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_top1_per_class_reference_tie_semantics():
    """Reference argmax is over the 29 region columns only: even when
    background dominates, each valid proposal still 'predicts' its best
    region (ties -> region 0), exactly like custom_roi_heads.py:143."""
    logits = np.full((4, 30), -5.0, np.float32)
    logits[:, 0] = 5.0  # background wins everywhere -> region scores tie
    sel = top1_per_class(jnp.asarray(logits), jnp.ones(4, bool))
    detected = np.asarray(sel["class_detected"])
    assert detected[0] and not detected[1:].any()
    np.testing.assert_array_equal(np.asarray(sel["top_idx"]), np.zeros(29))


def test_top1_per_class_invalid_proposals_excluded():
    logits = np.full((4, 30), 0.0, np.float32)
    logits[0, 3] = 9.0   # proposal 0 strongly predicts region 2
    logits[1, 5] = 9.0   # proposal 1 strongly predicts region 4
    valid = np.array([True, False, True, True])
    sel = top1_per_class(jnp.asarray(logits), jnp.asarray(valid))
    detected = np.asarray(sel["class_detected"])
    assert detected[2] and not detected[4]  # invalid proposal can't detect
