"""Data pipeline tests: transform numerics and batch assembly."""

import os

import cv2
import numpy as np
import pandas as pd
import pytest

from rgrg_tpu.core import constants as C
from rgrg_tpu.data import transforms as T
from rgrg_tpu.data.dataset import RGRGDataset, read_split_csv
from rgrg_tpu.text.tokenizer import GPT2Tokenizer


class TestTransforms:
    def test_longest_max_size_scales_boxes(self):
        img = np.zeros((1024, 768), np.uint8)
        boxes = np.array([[100, 200, 300, 400]], np.float32)
        out, b = T.longest_max_size(img, 512, boxes)
        assert max(out.shape) == 512
        assert out.shape == (512, 384)
        np.testing.assert_allclose(b, boxes * 0.5)

    def test_pad_centers(self):
        img = np.ones((512, 384), np.uint8)
        boxes = np.array([[0, 0, 10, 10]], np.float32)
        out, b = T.pad_to_square(img, 512, boxes)
        assert out.shape == (512, 512)
        # left pad = (512-384)//2 = 64
        np.testing.assert_allclose(b, [[64, 0, 74, 10]])
        assert out[:, :64].sum() == 0 and out[:, 64:448].all()

    def test_normalize_matches_albumentations_formula(self):
        img = np.array([[0, 128, 255]], np.uint8)
        out = T.normalize(img, T.TransformConfig())
        want = (img.astype(np.float32) - 0.471 * 255) / (0.302 * 255)
        np.testing.assert_allclose(out, want, rtol=1e-6)

    def test_val_transform_shapes(self):
        img = (np.random.default_rng(0).uniform(0, 255, (900, 700))).astype(np.uint8)
        boxes = np.array([[10, 10, 600, 800]], np.float32)
        out, b = T.val_transform(img, boxes)
        assert out.shape == (512, 512, 1)
        assert out.dtype == np.float32
        assert (b >= 0).all() and (b <= 512).all()

    def test_train_transform_deterministic_given_rng(self):
        img = (np.random.default_rng(1).uniform(0, 255, (640, 480))).astype(np.uint8)
        boxes = np.array([[50, 50, 300, 400]], np.float32)
        a1, b1, k1 = T.train_transform(img, boxes, np.random.default_rng(7))
        a2, b2, k2 = T.train_transform(img, boxes, np.random.default_rng(7))
        np.testing.assert_array_equal(a1, a2)
        np.testing.assert_array_equal(b1, b2)
        np.testing.assert_array_equal(k1, k2)
        assert a1.shape == (512, 512, 1)


class TestDataset:
    @pytest.fixture
    def csv_path(self, tmp_path):
        # two synthetic grayscale images + csv rows with 3 boxes each
        rows = []
        for i in range(3):
            p = str(tmp_path / f"img{i}.png")
            img = (np.random.default_rng(i).uniform(0, 255, (600, 500))).astype(np.uint8)
            cv2.imwrite(p, img)
            rows.append({
                "mimic_image_file_path": p,
                "bbox_coordinates": str([[10, 10, 100, 100], [50, 60, 300, 200],
                                         [5, 5, 480, 590]]),
                "bbox_labels": str([1, 5, 17]),
                "bbox_phrases": str(["The heart is normal."] + [""] * 28),
                "bbox_phrase_exists": str([True] + [False] * 28),
                "bbox_is_abnormal": str([False] * 29),
                "reference_report": "The heart is normal.",
            })
        path = str(tmp_path / "split.csv")
        pd.DataFrame(rows).to_csv(path, index=False)
        return path

    def test_batches(self, csv_path):
        df = read_split_csv(csv_path)
        ds = RGRGDataset(df, GPT2Tokenizer.dummy(), train=False, seq_len=32)
        batches = list(ds.batches(batch_size=2, drop_last=True))
        assert len(batches) == 1
        b = batches[0]
        assert b["images"].shape == (2, 512, 512, 1)
        assert b["gt_boxes"].shape == (2, 29, 4)
        assert b["gt_valid"].sum() == 6  # 3 boxes per image
        # labels scattered to their slots
        assert b["gt_labels"][0, 0] == 1 and b["gt_labels"][0, 4] == 5
        assert b["gt_valid"][0, [0, 4, 16]].all()
        assert b["input_ids"].shape == (2, 29, 32)
        assert b["region_has_sentence"][0, 0] and not b["region_has_sentence"][0, 1]
        assert b["reference_reports"][0].startswith("The heart")

    def test_bad_image_skipped(self, csv_path, tmp_path):
        df = read_split_csv(csv_path)
        df.loc[0, "mimic_image_file_path"] = str(tmp_path / "missing.png")
        ds = RGRGDataset(df, GPT2Tokenizer.dummy(), train=False)
        batches = list(ds.batches(batch_size=2, drop_last=True))
        assert len(batches) == 1  # 2 good samples remain

    def test_train_mode_augments(self, csv_path):
        df = read_split_csv(csv_path)
        ds = RGRGDataset(df, None, train=True)
        s = ds[0]
        assert s.image.shape == (512, 512, 1)


class TestTrainAugmentationProperties:
    """Checks of the albumentations-1.1.0-exact train augmentations.

    albumentations is not installable offline, so the library cannot serve
    as a sample-level oracle; instead the LUT/matrix/filter helpers are
    verified against independent numpy re-derivations (the library's
    published algorithms), and the pipeline against distributional
    contracts. See transforms.train_transform for the semantics matched."""

    def _img(self, seed=0):
        rng = np.random.default_rng(seed)
        img = rng.integers(30, 220, (700, 600)).astype(np.uint8)
        boxes = np.array([[100, 150, 380, 420], [10, 20, 90, 110]], np.float32)
        return img, boxes

    def test_output_contract(self):
        img, boxes = self._img()
        for seed in range(5):
            out, b, keep = T.train_transform(img, boxes,
                                             np.random.default_rng(seed))
            assert out.shape == (512, 512, 1) and out.dtype == np.float32
            assert keep.all()  # interior boxes survive +-2% / +-2 deg
            assert b.shape == boxes.shape
            assert (b[:, 2] >= b[:, 0]).all() and (b[:, 3] >= b[:, 1]).all()
            assert (b >= 0).all() and (b <= 512).all()

    def test_affine_box_follows_corners(self):
        """With a fixed rng, re-deriving the box from the image content
        (a bright rectangle) must agree with the transformed box."""
        img = np.zeros((512, 512), np.uint8)
        img[200:300, 150:350] = 255
        boxes = np.array([[150, 200, 350, 300]], np.float32)
        out, b, _ = T.train_transform(img, boxes, np.random.default_rng(11))
        ys, xs = np.nonzero(out[..., 0] > out.max() * 0.5)
        # content bbox within ~2px of the reported box (interp blur aside)
        assert abs(xs.min() - b[0, 0]) < 3 and abs(xs.max() + 1 - b[0, 2]) < 3
        assert abs(ys.min() - b[0, 1]) < 3 and abs(ys.max() + 1 - b[0, 3]) < 3

    def test_brightness_lut_matches_numpy_oracle(self):
        """cv2.LUT path == independent numpy table lookup with
        albumentations' clip-then-truncate quantization."""
        img = np.random.default_rng(0).integers(0, 256, (64, 64),
                                                dtype=np.uint8)
        for f in (0.8, 1.0, 1.17, 1.2, 0.0):
            got = T.adjust_brightness_uint8(img, f)
            lut = np.clip(np.arange(256, dtype=np.float32) * f,
                          0, 255).astype(np.uint8)
            np.testing.assert_array_equal(got, lut[img])

    def test_contrast_lut_matches_numpy_oracle(self):
        """Contrast pivots on the CURRENT image's float mean, LUT-quantized
        by truncation (albumentations adjust_contrast_torchvision)."""
        img = np.random.default_rng(1).integers(0, 256, (64, 64),
                                                dtype=np.uint8)
        for f in (0.8, 1.2, 0.95):
            got = T.adjust_contrast_uint8(img, f)
            mean = img.mean()
            lut = np.clip(np.arange(256) * f + mean * (1 - f),
                          0, 255).astype(np.uint8)
            np.testing.assert_array_equal(got, lut[img])
        # factor 0 collapses to the rounded mean
        assert (T.adjust_contrast_uint8(img, 0.0)
                == int(img.mean() + 0.5)).all()

    def test_jitter_order_matters_and_is_drawn(self):
        """Contrast pivots on the running mean, so brightness-then-contrast
        differs from contrast-then-brightness — the order permutation is a
        real degree of freedom (why albumentations shuffles it)."""
        img = np.random.default_rng(2).integers(0, 200, (64, 64),
                                                dtype=np.uint8)
        p_bc = T.AugParams(jitter=True, order=(0, 1, 2, 3), brightness=1.2,
                           contrast=1.2)
        p_cb = T.AugParams(jitter=True, order=(1, 0, 2, 3), brightness=1.2,
                           contrast=1.2)
        a = T.color_jitter_gray_uint8(img, p_bc)
        b = T.color_jitter_gray_uint8(img, p_cb)
        assert (a != b).any()
        orders = {T.sample_aug_params(np.random.default_rng(s), 512, 512).order
                  for s in range(50)
                  if T.sample_aug_params(np.random.default_rng(s), 512,
                                         512).jitter}
        assert len(orders) > 3  # the permutation really varies

    def test_affine_matrix_halfpixel_center(self):
        """angle=0, t=0 -> identity; any rotation fixes the half-pixel
        center (w/2-0.5, h/2-0.5) exactly (skimage composition)."""
        np.testing.assert_allclose(T.affine_matrix(0, 0, 0, 100, 80),
                                   np.eye(3), atol=1e-12)
        m = T.affine_matrix(37.0, 0, 0, 100, 80)
        center = np.array([80 / 2 - 0.5, 100 / 2 - 0.5, 1.0])
        np.testing.assert_allclose(m @ center, center, atol=1e-9)
        # skimage rotation sign: +angle maps +x toward +y (pre-1.4 sense)
        pt = m[:2] @ np.array([80 / 2 - 0.5 + 10, 100 / 2 - 0.5, 1.0])
        assert pt[1] > 100 / 2 - 0.5

    def test_gauss_noise_is_unclipped_float(self):
        """1.1.0 gauss_noise adds float noise with NO clip: a saturated
        image must show normalized values beyond the uint8-max mapping."""
        img = np.full((256, 256), 255, np.uint8)
        boxes = np.zeros((0, 4), np.float32)
        from rgrg_tpu.core import constants as C_
        max_u8 = (255 - 255 * C_.IMAGE_MEAN) / (255 * C_.IMAGE_STD)
        seen_above = False
        for seed in range(40):
            p = T.sample_aug_params(np.random.default_rng(seed), 256, 256)
            if not p.noise or p.jitter:
                continue
            out, _, _ = T.train_transform(img, boxes,
                                          np.random.default_rng(seed))
            seen_above |= bool((out > max_u8 + 1e-6).any())
            if seen_above:
                break
        assert seen_above, "noise was clipped to uint8 range"

    def test_noise_variance_within_declared_range(self):
        """When only GaussNoise fires, the added noise std must be within
        sqrt([10, 50]) of the declared var_limit (albumentations
        contract). Decisions are replayed via sample_aug_params (same rng
        consumption as train_transform's sampling stage)."""
        img = np.full((256, 256), 128, np.uint8)
        boxes = np.zeros((0, 4), np.float32)
        stds = []
        for seed in range(40):
            p = T.sample_aug_params(np.random.default_rng(seed), 256, 256)
            if not p.noise or p.jitter:
                continue
            out, _, _ = T.train_transform(img, boxes,
                                          np.random.default_rng(seed))
            # affine on a constant image only moves borders; use center crop
            center = out[200:300, 200:300, 0] * 1.0
            stds.append(center.std())
        assert stds, "no noise-only draws in 40 seeds"
        from rgrg_tpu.core import constants as C_
        lo = np.sqrt(10) / 255 / C_.IMAGE_STD * 0.5
        hi = np.sqrt(50) / 255 / C_.IMAGE_STD * 1.5
        assert lo <= np.median(stds) <= hi, (np.median(stds), lo, hi)

    def test_brightness_contrast_bounded(self):
        """ColorJitter-only draws stay within the +-20% envelope."""
        img = np.full((64, 64), 100, np.uint8)
        boxes = np.zeros((0, 4), np.float32)
        out_ref, _ = T.val_transform(img, boxes)
        ref = float(out_ref[32, 32, 0])
        for seed in range(30):
            out, _, _ = T.train_transform(img, boxes,
                                          np.random.default_rng(seed))
            center = float(np.median(out[28:36, 28:36, 0]))
            assert np.isfinite(center)
            # un-normalize both to pixel space; ColorJitter's +-20%
            # brightness/contrast envelope on a uniform 100-value image
            # bounds the pixel at [100*0.8*0.8, 100*1.2*1.2], plus noise
            # (std <= sqrt(50)) and interpolation margin
            from rgrg_tpu.core import constants as C_
            px = center * 255 * C_.IMAGE_STD + 255 * C_.IMAGE_MEAN
            px_ref = ref * 255 * C_.IMAGE_STD + 255 * C_.IMAGE_MEAN
            assert abs(px_ref - 100) < 2, px_ref
            assert 100 * 0.8 * 0.8 - 25 <= px <= 100 * 1.2 * 1.2 + 25, px

    def test_filter_boxes_clip_and_drop(self):
        """Partially-outside boxes are clipped and kept; fully-outside
        boxes (zero clipped area) are dropped — and row_to_sample clears
        gt_valid for the dropped label."""
        boxes = np.array([[-20, -20, 30, 30],     # partial: clipped
                          [-50, -50, -10, -10],   # outside: dropped
                          [10, 10, 40, 40]], np.float32)
        clipped, keep = T.filter_boxes(boxes, 512)
        np.testing.assert_array_equal(keep, [True, False, True])
        np.testing.assert_array_equal(clipped[0], [0, 0, 30, 30])
        # degenerate (zero-area inside) also drops
        _, k2 = T.filter_boxes(np.array([[5, 5, 5, 40]], np.float32), 512)
        assert not k2[0]


class TestPrefetchAndWorkers:
    @pytest.fixture
    def csv_path(self, tmp_path):
        rows = []
        for i in range(5):
            p = str(tmp_path / f"img{i}.png")
            img = (np.random.default_rng(i).uniform(0, 255, (600, 500))
                   ).astype(np.uint8)
            cv2.imwrite(p, img)
            rows.append({
                "mimic_image_file_path": p,
                "bbox_coordinates": str([[10, 10, 100, 100],
                                         [50, 60, 300, 200]]),
                "bbox_labels": str([1, 5]),
            })
        path = str(tmp_path / "split.csv")
        pd.DataFrame(rows).to_csv(path, index=False)
        return path

    def test_prefetched_preserves_order(self):
        from rgrg_tpu.data.prefetch import prefetched
        assert list(prefetched(iter(range(100)), depth=3)) == list(range(100))

    def test_prefetched_reraises_producer_error(self):
        from rgrg_tpu.data.prefetch import prefetched

        def gen():
            yield 1
            raise RuntimeError("boom")

        it = prefetched(gen(), depth=2)
        assert next(it) == 1
        with pytest.raises(RuntimeError, match="boom"):
            list(it)

    def test_prefetched_factory_fresh_per_epoch(self):
        from rgrg_tpu.data.prefetch import prefetched_factory
        f = prefetched_factory(lambda: iter([1, 2, 3]))
        assert list(f()) == [1, 2, 3]
        assert list(f()) == [1, 2, 3]

    def test_workers_match_sync_in_val_mode(self, csv_path):
        """val mode has no augmentation rng, so threaded construction must
        be bit-identical to the synchronous path, in order."""
        df = read_split_csv(csv_path)
        a = list(RGRGDataset(df, None, train=False).batches(2, workers=0))
        b = list(RGRGDataset(df, None, train=False).batches(2, workers=3))
        assert len(a) == len(b) == 2
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x["images"], y["images"])
            np.testing.assert_array_equal(x["gt_boxes"], y["gt_boxes"])

    def test_workers_deterministic_in_train_mode(self, csv_path):
        """Per-(seed, epoch, idx) SeedSequence: two runs with the same seed
        produce identical augmented batches regardless of scheduling, and
        a later epoch draws differently."""
        df = read_split_csv(csv_path)
        a = list(RGRGDataset(df, None, train=True).batches(2, workers=3))
        b = list(RGRGDataset(df, None, train=True).batches(2, workers=3))
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x["images"], y["images"])
        ds = RGRGDataset(df, None, train=True)
        e0 = list(ds.batches(2, workers=3))
        e1 = list(ds.batches(2, workers=3))  # epoch counter advanced
        assert any((x["images"] != y["images"]).any()
                   for x, y in zip(e0, e1))


def test_train_boxes_clip_at_prepad_frame():
    """check_each_transform semantics: after Affine, boxes clip against
    the PRE-PAD resized frame, so padded-in coordinates can never exceed
    resized-extent + pad-shift (a 512-only clip would allow boxes to leak
    into the zero padding)."""
    img = np.random.default_rng(0).integers(0, 255, (700, 600)
                                            ).astype(np.uint8)
    # box touching the right edge of the 600-wide image
    boxes = np.array([[560, 100, 600, 400], [0, 0, 600, 700]], np.float32)
    scaled_w = round(600 * 512 / 700)            # 439
    left = (512 - scaled_w) // 2                 # 36
    for seed in range(30):
        _, b, keep = T.train_transform(img, boxes,
                                       np.random.default_rng(seed))
        assert (b[:, 0] >= left).all() and (b[:, 2] <= scaled_w + left).all(), \
            (seed, b)


def test_prefetched_releases_producer_on_abandon():
    import threading
    import time

    from rgrg_tpu.data.prefetch import prefetched

    def gen():
        for i in range(10_000):
            yield i

    it = prefetched(gen(), depth=2)
    assert next(it) == 0
    it.close()  # consumer abandons mid-epoch
    deadline = time.time() + 5.0
    while time.time() < deadline:
        if not any(t.name == "rgrg-prefetch" and t.is_alive()
                   for t in threading.enumerate()):
            break
        time.sleep(0.05)
    assert not any(t.name == "rgrg-prefetch" and t.is_alive()
                   for t in threading.enumerate()), "producer leaked"
