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


@dataclasses.dataclass(frozen=True)
class AugParams:
    """One draw of the train-augmentation parameters (albumentations-1.1.0
    sampling order: each transform draws its p-gate, then its parameters
    only if it fired — Compose order ColorJitter, GaussNoise, Affine)."""
    jitter: bool
    order: Tuple[int, ...] = ()       # permutation of (b, c, s, h) ops
    brightness: float = 1.0
    contrast: float = 1.0
    saturation: float = 1.0           # no-op on grayscale, drawn anyway
    hue: float = 0.0                  # hue=0 in the reference: no-op
    noise: bool = False
    sigma: float = 0.0
    affine: bool = False
    angle: float = 0.0                # degrees
    tx: float = 0.0                   # pixels (translate_percent * width)
    ty: float = 0.0


def sample_aug_params(rng: np.random.Generator, height: int,
                      width: int) -> AugParams:
    """Draw the augmentation parameters for one sample, replicating
    albumentations 1.1.0's per-transform distributions for the reference's
    pipeline (train_full_model.py:348-361): ColorJitter(hue=0) p=.5 with
    factor ranges [0.8, 1.2] and a shuffled op order; GaussNoise var
    [10, 50] p=.5; Affine rotate ±2°, translate_percent ±2% drawn
    INDEPENDENTLY per axis, p=.5. (height, width) are the post-resize dims —
    albumentations samples Affine params against the image it receives."""
    kw = {}
    jitter = rng.uniform() < 0.5
    if jitter:
        kw.update(brightness=rng.uniform(0.8, 1.2),
                  contrast=rng.uniform(0.8, 1.2),
                  saturation=rng.uniform(0.8, 1.2),
                  hue=0.0,
                  order=tuple(int(i) for i in rng.permutation(4)))
    noise = rng.uniform() < 0.5
    if noise:
        kw["sigma"] = float(np.sqrt(rng.uniform(10.0, 50.0)))
    affine = rng.uniform() < 0.5
    if affine:
        kw.update(tx=rng.uniform(-0.02, 0.02) * width,
                  ty=rng.uniform(-0.02, 0.02) * height,
                  angle=rng.uniform(-2.0, 2.0))
    return AugParams(jitter=jitter, noise=noise, affine=affine, **kw)


def _lut_uint8(image: np.ndarray, lut: np.ndarray) -> np.ndarray:
    """albumentations' clip(): np.clip then astype (truncation, NOT
    rounding) — the uint8 quantization every LUT op inherits."""
    return cv2.LUT(image, np.clip(lut, 0, 255).astype(np.uint8))


def adjust_brightness_uint8(image: np.ndarray, factor: float) -> np.ndarray:
    """albumentations 1.1.0 adjust_brightness_torchvision for uint8:
    LUT = clip(arange(256) * factor). The float32 LUT matches the
    library's _multiply_uint8_optimized (which allocates its table as
    float32, unlike the contrast helper's float64 arange) — the library
    itself is asymmetric here. If 1.1.0's brightness actually computed in
    f64, ~0.07% of factor draws would differ by one uint8 step; not
    resolvable offline (library not installable)."""
    if factor == 0:
        return np.zeros_like(image)
    if factor == 1:
        return image
    return _lut_uint8(image, np.arange(0, 256, dtype=np.float32) * factor)


def adjust_contrast_uint8(image: np.ndarray, factor: float) -> np.ndarray:
    """albumentations 1.1.0 adjust_contrast_torchvision for uint8
    grayscale: pivot on the CURRENT image's float mean,
    LUT = clip(arange(256) * factor + mean * (1 - factor))."""
    if factor == 1:
        return image
    mean = image.mean()
    if factor == 0:
        return np.full_like(image, int(mean + 0.5))
    return _lut_uint8(image,
                      np.arange(0, 256, dtype=np.float64) * factor
                      + mean * (1 - factor))


def color_jitter_gray_uint8(image: np.ndarray, p: AugParams) -> np.ndarray:
    """ColorJitter on grayscale uint8: the four sub-ops run in the drawn
    permutation order; saturation returns the input unchanged for grayscale
    and hue=0 short-circuits, so only brightness/contrast act — but their
    RELATIVE order still matters because contrast pivots on the current
    mean (albumentations 1.1.0 ColorJitter.get_params shuffles the op
    list)."""
    for i in p.order:
        if i == 0:
            image = adjust_brightness_uint8(image, p.brightness)
        elif i == 1:
            image = adjust_contrast_uint8(image, p.contrast)
        # i == 2 (saturation): identity on grayscale; i == 3: hue == 0
    return image


def affine_matrix(angle_deg: float, tx: float, ty: float, height: int,
                  width: int) -> np.ndarray:
    """albumentations 1.1.0 Affine matrix (geometric/transforms.py): the
    skimage composition  to_topleft -> AffineTransform(rotation, translation)
    -> to_center  about the HALF-PIXEL center (w/2 - 0.5, h/2 - 0.5), with
    skimage's rotation sign ([[c, -s], [s, c]]; the counter-clockwise flip
    only landed in albumentations 1.4). Returns the 3x3 homogeneous
    matrix."""
    r = np.deg2rad(angle_deg)
    c, s = np.cos(r), np.sin(r)
    rot = np.array([[c, -s, tx], [s, c, ty], [0, 0, 1]])

    def shift(sx, sy):
        return np.array([[1, 0, sx], [0, 1, sy], [0, 0, 1]], np.float64)

    sx, sy = width / 2 - 0.5, height / 2 - 0.5
    return shift(sx, sy) @ rot @ shift(-sx, -sy)


def transform_boxes_affine(boxes: np.ndarray, m: np.ndarray) -> np.ndarray:
    """bbox_affine: transform the 4 corners, take per-box min/max (no
    clipping here — filtering clips once at the end of the pipeline)."""
    corners = np.stack([
        boxes[:, [0, 1]], boxes[:, [2, 1]], boxes[:, [0, 3]], boxes[:, [2, 3]],
    ], axis=1)  # [N, 4, 2]
    ones = np.ones((*corners.shape[:2], 1))
    tc = np.concatenate([corners, ones], axis=-1) @ m[:2].T  # [N, 4, 2]
    return np.concatenate([tc.min(axis=1), tc.max(axis=1)],
                          axis=-1).astype(np.float32)


def filter_boxes(boxes: np.ndarray, width: int, height: Optional[int] = None):
    """albumentations bbox clip-and-filter with the reference's default
    BboxParams (min_area=0, min_visibility=0): clip each box to the given
    frame and DROP boxes whose clipped area is zero (fully outside).
    Runs after EACH geometric transform (BboxParams default
    check_each_transform=True) and once more as postprocess — the
    reference dataset sees a dropped box vanish from the
    bboxes/class_labels lists
    (custom_image_dataset_object_detector.py:33-37).
    Returns (all boxes clipped, keep mask)."""
    if height is None:
        height = width
    if not len(boxes):
        return boxes, np.zeros((0,), bool)
    clipped = np.clip(boxes, 0, [width, height, width, height]
                      ).astype(np.float32)
    keep = ((clipped[:, 2] - clipped[:, 0]) *
            (clipped[:, 3] - clipped[:, 1])) > 0
    return clipped, keep


def train_transform(image: np.ndarray, boxes: np.ndarray,
                    rng: np.random.Generator,
                    cfg: TransformConfig = TransformConfig()):
    """The reference's albumentations-1.1.0 train pipeline
    (train_full_model.py:348-367), re-implemented numerically:

      LongestMaxSize(512, INTER_AREA) -> ColorJitter(hue=0) p=.5 ->
      GaussNoise(var 10-50) p=.5 -> Affine(±2% translate, ±2°, zero fill)
      p=.5 -> PadIfNeeded(512, center, zeros) -> Normalize -> HWC f32

    Exact 1.1.0 semantics preserved: uint8 LUT truncation in the jitter
    sub-ops, per-call shuffled jitter op order, GaussNoise adds float64
    noise WITHOUT clipping (the image leaves GaussNoise as float, so a
    subsequent warp interpolates unclipped values — 1.1.0
    functional.gauss_noise has no clip), Affine's half-pixel-centered
    skimage matrix with independent x/y translation draws, corner-min/max
    box transform, and end-of-pipeline clip-and-drop box filtering.

    Random draws use the supplied numpy Generator (the library's
    python-random/RandomState streams are not reproduced — seeding differs
    from the reference run anyway; every sampled DISTRIBUTION and all
    pixel/box math match).

    Returns (image [S, S, 1] float32, boxes [K, 4] clipped to bounds,
    keep [N] bool) — keep marks input boxes that survived filtering;
    boxes contains only the survivors, mirroring the reference's shrinking
    bboxes/class_labels lists."""
    if boxes is None:
        boxes = np.zeros((0, 4), np.float32)
    image, boxes = longest_max_size(image, cfg.image_size, boxes)
    h, w = image.shape[:2]
    p = sample_aug_params(rng, h, w)

    if p.jitter:
        image = color_jitter_gray_uint8(image, p)
    if p.noise:
        # float64 out (f32 image + f64 noise), unclipped — 1.1.0 behavior
        image = image.astype(np.float32) + rng.normal(0.0, p.sigma,
                                                      image.shape)
    if p.affine:
        m = affine_matrix(p.angle, p.tx, p.ty, h, w)
        image = cv2.warpAffine(image, m[:2], (w, h), flags=cv2.INTER_LINEAR,
                               borderMode=cv2.BORDER_CONSTANT, borderValue=0)
        if len(boxes):
            boxes = transform_boxes_affine(boxes, m)

    # BboxParams(check_each_transform=True) default: boxes clip/filter
    # against the CURRENT frame after each geometric transform — after
    # Affine that is the PRE-PAD (h, w) frame, so a box pushed past the
    # resized edge clips before the center shift (clipping at 512 only
    # would leave it up to pad-width wider, into the zero padding)
    boxes, keep = filter_boxes(boxes, w, h)
    image, boxes = pad_to_square(image, cfg.image_size, boxes)
    boxes, keep2 = filter_boxes(boxes, cfg.image_size)
    keep &= keep2
    image = normalize(image, cfg)
    return image[..., None], boxes[keep], keep


def load_image(path: str) -> np.ndarray:
    """cv2.IMREAD_UNCHANGED single-channel read (reference
    custom_image_dataset_object_detector.py:15)."""
    img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if img is None:
        raise FileNotFoundError(path)
    if img.ndim == 3:
        img = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
    return img
