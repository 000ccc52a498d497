"""Host-side image transforms, matching the reference's albumentations
pipelines numerically (train_full_model.py:340-383,
generate_reports_for_images.py:134-141):

  val/test: LongestMaxSize(512, INTER_AREA) -> PadIfNeeded(512, 512, center,
            zeros) -> Normalize(mean .471, std .302, max_pixel 255) -> tensor
  train:    + ColorJitter(hue=0) + GaussNoise + Affine(±2% translate,
            ±2° rotate) before padding.

Bbox coordinates (pascal_voc) follow the same resize/shift.
Output is NHWC float32 [H, W, 1] — the TPU-native layout.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import cv2
import numpy as np

from rgrg_tpu.core import constants as C


@dataclasses.dataclass(frozen=True)
class TransformConfig:
    image_size: int = C.IMAGE_SIZE
    mean: float = C.IMAGE_MEAN
    std: float = C.IMAGE_STD
    max_pixel_value: float = 255.0


def longest_max_size(image: np.ndarray, max_size: int,
                     boxes: Optional[np.ndarray] = None):
    """Resize so the longest side == max_size (cv2 INTER_AREA), scaling
    boxes by the same factor (albumentations LongestMaxSize)."""
    h, w = image.shape[:2]
    scale = max_size / max(h, w)
    if scale != 1.0:
        new_w, new_h = round(w * scale), round(h * scale)
        image = cv2.resize(image, (new_w, new_h), interpolation=cv2.INTER_AREA)
        if boxes is not None and len(boxes):
            boxes = boxes * scale
    return image, boxes


def pad_to_square(image: np.ndarray, size: int,
                  boxes: Optional[np.ndarray] = None):
    """Center-pad with zeros to size x size (albumentations PadIfNeeded
    default position), shifting boxes."""
    h, w = image.shape[:2]
    top = max((size - h) // 2, 0)
    bottom = max(size - h - top, 0)
    left = max((size - w) // 2, 0)
    right = max(size - w - left, 0)
    image = cv2.copyMakeBorder(image, top, bottom, left, right,
                               cv2.BORDER_CONSTANT, value=0)
    if boxes is not None and len(boxes):
        boxes = boxes + np.array([left, top, left, top], boxes.dtype)
    return image, boxes


def normalize(image: np.ndarray, cfg: TransformConfig) -> np.ndarray:
    """(img - mean*maxpix) / (std*maxpix), float32 (albumentations
    Normalize)."""
    denom = cfg.std * cfg.max_pixel_value
    return (image.astype(np.float32) - cfg.mean * cfg.max_pixel_value) / denom


def val_transform(image: np.ndarray, boxes: Optional[np.ndarray] = None,
                  cfg: TransformConfig = TransformConfig()):
    """Eval/inference pipeline. image: [H, W] grayscale uint8/uint16.
    Returns (image [S, S, 1] float32, boxes or None)."""
    image, boxes = longest_max_size(image, cfg.image_size, boxes)
    image, boxes = pad_to_square(image, cfg.image_size, boxes)
    image = normalize(image, cfg)
    return image[..., None], boxes


def train_transform(image: np.ndarray, boxes: np.ndarray,
                    rng: np.random.Generator,
                    cfg: TransformConfig = TransformConfig()):
    """Training augmentations approximating the reference's albumentations
    stack (ColorJitter brightness/contrast/saturation ±0.2 hue 0,
    GaussNoise var 10-50, Affine ±2% translate / ±2° rotate, zero fill).
    Random draws use the supplied numpy Generator, seeded per worker like
    the reference's seeded DataLoader workers.

    Known divergences from albumentations (not installable offline, so no
    numeric oracle exists — property contracts are pinned in
    tests/test_data.py::TestTrainAugmentationProperties):
      * ColorJitter applies brightness->contrast in fixed order; torchvision
        (and albumentations) permute the op order per call,
      * contrast pivots on the per-image mean (torchvision pivots on the
        mean of the grayscale image — identical here since input IS gray),
      * GaussNoise clips to uint8 after adding noise in f32 (albumentations
        adds in f32 then clips identically; per_channel irrelevant on 1ch),
      * Affine composes rotation and translation in one matrix like
        albumentations' single warp; box corners are transformed exactly.
    Augmentation DISTRIBUTIONS match the declared parameter ranges; only
    intra-op ordering differs, which perturbs individual samples, not the
    augmentation envelope."""
    image, boxes = longest_max_size(image, cfg.image_size, boxes)

    # ColorJitter (hue=0 on grayscale -> brightness/contrast only)
    if rng.uniform() < 0.5:
        brightness = rng.uniform(0.8, 1.2)
        contrast = rng.uniform(0.8, 1.2)
        img = image.astype(np.float32) * brightness
        mean = img.mean()
        img = (img - mean) * contrast + mean
        image = np.clip(img, 0, cfg.max_pixel_value).astype(image.dtype)

    # GaussNoise
    if rng.uniform() < 0.5:
        var = rng.uniform(10.0, 50.0)
        noise = rng.normal(0.0, np.sqrt(var), image.shape)
        image = np.clip(image.astype(np.float32) + noise, 0,
                        cfg.max_pixel_value).astype(np.uint8)

    # Affine: ±2% translation, ±2 deg rotation, constant 0 fill
    h, w = image.shape[:2]
    angle = rng.uniform(-2.0, 2.0)
    tx = rng.uniform(-0.02, 0.02) * w
    ty = rng.uniform(-0.02, 0.02) * h
    m = cv2.getRotationMatrix2D((w / 2, h / 2), angle, 1.0)
    m[:, 2] += (tx, ty)
    image = cv2.warpAffine(image, m, (w, h), flags=cv2.INTER_LINEAR,
                           borderMode=cv2.BORDER_CONSTANT, borderValue=0)
    if len(boxes):
        corners = np.stack([
            boxes[:, [0, 1]], boxes[:, [2, 1]], boxes[:, [0, 3]], boxes[:, [2, 3]],
        ], axis=1)  # [N, 4, 2]
        ones = np.ones((*corners.shape[:2], 1))
        tc = np.concatenate([corners, ones], axis=-1) @ m.T  # [N, 4, 2]
        boxes = np.concatenate([tc.min(axis=1), tc.max(axis=1)], axis=-1)
        boxes = np.clip(boxes, 0, [w, h, w, h]).astype(np.float32)

    image, boxes = pad_to_square(image, cfg.image_size, boxes)
    image = normalize(image, cfg)
    return image[..., None], boxes


def load_image(path: str) -> np.ndarray:
    """cv2.IMREAD_UNCHANGED single-channel read (reference
    custom_image_dataset_object_detector.py:15)."""
    img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if img is None:
        raise FileNotFoundError(path)
    if img.ndim == 3:
        img = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
    return img
