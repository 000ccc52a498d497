"""Unit tests for rgrg_tpu.ops against independent scalar oracles."""

import numpy as np
import jax.numpy as jnp
import pytest

from rgrg_tpu.core.config import AnchorConfig
from rgrg_tpu.ops import anchors as anchors_lib
from rgrg_tpu.ops import boxes as boxes_lib
from rgrg_tpu.ops import nms as nms_lib
from rgrg_tpu.ops import roi_align as roi_lib

from tests.oracles import decode_boxes_oracle, nms_oracle, roi_align_oracle, iou_single


RNG = np.random.default_rng(0)


def random_boxes(n, extent=512.0, min_size=1.0, rng=RNG):
    x1 = rng.uniform(0, extent - min_size, n)
    y1 = rng.uniform(0, extent - min_size, n)
    w = rng.uniform(min_size, extent / 3, n)
    h = rng.uniform(min_size, extent / 3, n)
    x2 = np.minimum(x1 + w, extent)
    y2 = np.minimum(y1 + h, extent)
    return np.stack([x1, y1, x2, y2], axis=1).astype(np.float32)


class TestBoxes:
    def test_iou_matches_oracle(self):
        a = random_boxes(13)
        b = random_boxes(7)
        got = np.asarray(boxes_lib.box_iou(jnp.asarray(a), jnp.asarray(b)))
        want = np.array([[iou_single(x.astype(np.float64), y.astype(np.float64))
                          for y in b] for x in a])
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_decode_matches_oracle(self):
        boxes = random_boxes(50)
        deltas = RNG.normal(0, 1, (50, 30 * 4)).astype(np.float32)
        got = np.asarray(boxes_lib.decode_boxes(jnp.asarray(deltas), jnp.asarray(boxes),
                                                weights=(10.0, 10.0, 5.0, 5.0)))
        want = decode_boxes_oracle(deltas, boxes, weights=(10.0, 10.0, 5.0, 5.0))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-3)

    def test_encode_decode_roundtrip(self):
        props = random_boxes(40)
        gts = random_boxes(40)
        enc = boxes_lib.encode_boxes(jnp.asarray(gts), jnp.asarray(props))
        dec = boxes_lib.decode_boxes(enc, jnp.asarray(props))
        np.testing.assert_allclose(np.asarray(dec)[:, 0, :], gts, rtol=1e-3, atol=1e-2)

    def test_clip(self):
        b = jnp.asarray([[-5.0, -3.0, 600.0, 200.0]])
        out = np.asarray(boxes_lib.clip_boxes_to_image(b, 512, 512))
        np.testing.assert_allclose(out, [[0.0, 0.0, 512.0, 200.0]])

    def test_small_box_mask(self):
        b = jnp.asarray([[0, 0, 0.5e-3, 10], [0, 0, 10, 10]], dtype=jnp.float32)
        m = np.asarray(boxes_lib.remove_small_boxes_mask(b, 1e-3))
        assert m.tolist() == [False, True]


class TestAnchors:
    def test_layout(self):
        cfg = AnchorConfig()
        a = anchors_lib.grid_anchors(cfg)
        assert a.shape == (16 * 16 * 160, 4)
        base = anchors_lib.base_anchors(cfg)
        assert base.shape == (160, 4)
        # aspect-ratio-major ordering: first 10 anchors all have ratio 0.2
        ws = base[:10, 2] - base[:10, 0]
        hs = base[:10, 3] - base[:10, 1]
        ratios = hs / ws
        np.testing.assert_allclose(ratios, 0.2, rtol=0.15)  # rounding distorts small boxes
        # cell-major: anchors 0 and 160 differ by one stride in x
        np.testing.assert_allclose(a[160] - a[0], [32, 0, 32, 0])
        # row-major y: anchor at cell (1, 0) is index 16*160
        np.testing.assert_allclose(a[16 * 160] - a[0], [0, 32, 0, 32])

    def test_centered_and_rounded(self):
        base = anchors_lib.base_anchors(AnchorConfig())
        np.testing.assert_allclose(base[:, 0], -base[:, 2])
        np.testing.assert_allclose(base, np.round(base))
        # AR=1.0 size-300 anchor is exactly ±150
        cfg = AnchorConfig()
        idx = cfg.aspect_ratios.index(1.0) * len(cfg.sizes) + cfg.sizes.index(300)
        np.testing.assert_allclose(base[idx], [-150, -150, 150, 150])


class TestRoIAlign:
    @pytest.mark.parametrize("n,hw,c", [(9, 16, 5), (4, 16, 3)])
    def test_matches_oracle(self, n, hw, c):
        feats = RNG.normal(0, 1, (hw, hw, c)).astype(np.float32)
        boxes = random_boxes(n, extent=hw * 32.0, min_size=2.0)
        got = np.asarray(roi_lib.roi_align(jnp.asarray(feats), jnp.asarray(boxes),
                                           output_size=8, spatial_scale=1 / 32.0,
                                           sampling_ratio=2))
        want = roi_align_oracle(feats, boxes, 8, 1 / 32.0, 2)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_edge_boxes(self):
        """Boxes at/past image borders exercise clamping + out-of-range drops."""
        feats = RNG.normal(0, 1, (16, 16, 2)).astype(np.float32)
        boxes = np.array([
            [0.0, 0.0, 512.0, 512.0],     # full image
            [500.0, 500.0, 512.0, 512.0],  # bottom-right corner
            [0.0, 0.0, 0.5, 0.5],          # tiny box -> min size 1 in feature coords
            [480.0, 0.0, 512.0, 30.0],
        ], dtype=np.float32)
        got = np.asarray(roi_lib.roi_align(jnp.asarray(feats), jnp.asarray(boxes)))
        want = roi_align_oracle(feats, boxes, 8, 1 / 32.0, 2)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_batched(self):
        feats = RNG.normal(0, 1, (2, 16, 16, 4)).astype(np.float32)
        boxes = np.stack([random_boxes(6), random_boxes(6)])
        got = np.asarray(roi_lib.roi_align_batched(jnp.asarray(feats), jnp.asarray(boxes)))
        for b in range(2):
            want = roi_align_oracle(feats[b], boxes[b], 8, 1 / 32.0, 2)
            np.testing.assert_allclose(got[b], want, rtol=1e-4, atol=1e-4)

    def test_fused_matches_oracle_f32(self):
        """The fused outer-product formulation is the same math as the
        separable path (different associativity only): oracle-exact in f32."""
        feats = RNG.normal(0, 1, (2, 16, 16, 6)).astype(np.float32)
        boxes = np.stack([random_boxes(7), random_boxes(7)])
        got = np.asarray(roi_lib.roi_align_fused_batched(
            jnp.asarray(feats), jnp.asarray(boxes), compute_dtype=jnp.float32))
        for b in range(2):
            want = roi_align_oracle(feats[b], boxes[b], 8, 1 / 32.0, 2)
            np.testing.assert_allclose(got[b], want, rtol=1e-5, atol=1e-5)

    def test_fused_bf16_close_to_f32(self):
        """bf16 fused (the serving default) stays within bf16 resolution of
        the f32 separable parity path on edge + random boxes."""
        feats = RNG.normal(0, 1, (1, 16, 16, 8)).astype(np.float32)
        boxes = np.concatenate([
            random_boxes(5),
            np.array([[0.0, 0.0, 512.0, 512.0],
                      [500.0, 500.0, 512.0, 512.0],
                      [0.0, 0.0, 0.5, 0.5]], np.float32)])[None]
        ref = np.asarray(roi_lib.roi_align_batched(
            jnp.asarray(feats), jnp.asarray(boxes)))
        got = np.asarray(roi_lib.roi_align_fused_batched(
            jnp.asarray(feats), jnp.asarray(boxes),
            compute_dtype=jnp.bfloat16).astype(jnp.float32))
        np.testing.assert_allclose(got, ref, rtol=0.02, atol=0.03)


class TestNMS:
    def _run_both(self, n, thresh, seed):
        rng = np.random.default_rng(seed)
        boxes = random_boxes(n, rng=rng)
        scores = rng.uniform(0, 1, n).astype(np.float32)
        order = np.argsort(-scores, kind="stable")
        sorted_boxes = boxes[order]
        valid = np.ones(n, bool)

        keep_seq = np.asarray(nms_lib.nms_keep_mask(
            jnp.asarray(sorted_boxes), jnp.asarray(valid), thresh))
        keep_tiled = np.asarray(nms_lib.nms_keep_mask_tiled(
            jnp.asarray(sorted_boxes), jnp.asarray(valid), thresh))
        want_idx = nms_oracle(boxes, scores, thresh)
        # oracle returns original indices; map to sorted positions
        pos = {int(o): p for p, o in enumerate(order)}
        want = np.zeros(n, bool)
        for i in want_idx:
            want[pos[i]] = True
        np.testing.assert_array_equal(keep_seq, want)
        np.testing.assert_array_equal(keep_tiled, want)

    @pytest.mark.parametrize("seed", [1, 2, 3])
    def test_small(self, seed):
        self._run_both(50, 0.7, seed)

    def test_large_dense(self):
        # many overlapping boxes to force long suppression chains
        rng = np.random.default_rng(7)
        base = random_boxes(40, rng=rng)
        jitter = rng.normal(0, 6, (400, 4)).astype(np.float32)
        boxes = np.clip(base[rng.integers(0, 40, 400)] + jitter, 0, 512)
        boxes[:, 2] = np.maximum(boxes[:, 2], boxes[:, 0] + 1)
        boxes[:, 3] = np.maximum(boxes[:, 3], boxes[:, 1] + 1)
        scores = rng.uniform(0, 1, 400).astype(np.float32)
        order = np.argsort(-scores, kind="stable")
        sb = boxes[order]
        valid = np.ones(400, bool)
        keep_seq = np.asarray(nms_lib.nms_keep_mask(jnp.asarray(sb), jnp.asarray(valid), 0.5))
        keep_tiled = np.asarray(nms_lib.nms_keep_mask_tiled(jnp.asarray(sb), jnp.asarray(valid), 0.5))
        np.testing.assert_array_equal(keep_seq, keep_tiled)
        want_idx = nms_oracle(boxes, scores, 0.5)
        assert int(keep_seq.sum()) == len(want_idx)

    def test_validity_mask(self):
        boxes = np.array([[0, 0, 10, 10], [0, 0, 10.1, 10], [20, 20, 30, 30]], np.float32)
        valid = np.array([False, True, True])
        keep = np.asarray(nms_lib.nms_keep_mask(jnp.asarray(boxes), jnp.asarray(valid), 0.5))
        # box 0 invalid -> cannot suppress box 1
        assert keep.tolist() == [False, True, True]
