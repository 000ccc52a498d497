"""Scalar numpy oracles implementing the published torchvision op semantics.

These are deliberately written as slow, obvious scalar loops straight from
the algorithm definitions (Faster R-CNN paper + torchvision docs), so that
the fast vectorized/Pallas implementations in rgrg_tpu.ops can be verified
against an independent formulation.
"""

from __future__ import annotations

import numpy as np


def bilinear_interpolate_vec(data: np.ndarray, y: float, x: float) -> np.ndarray:
    """data: [H, W, C]. Same point semantics as bilinear_interpolate, all
    channels at once (the per-point scalar logic is unchanged)."""
    h, w = data.shape[:2]
    if y < -1.0 or y > h or x < -1.0 or x > w:
        return np.zeros(data.shape[2], dtype=np.float64)
    y = max(y, 0.0)
    x = max(x, 0.0)
    y_low = int(y)
    x_low = int(x)
    if y_low >= h - 1:
        y_high = y_low = h - 1
        y = float(y_low)
    else:
        y_high = y_low + 1
    if x_low >= w - 1:
        x_high = x_low = w - 1
        x = float(x_low)
    else:
        x_high = x_low + 1
    ly = y - y_low
    lx = x - x_low
    hy = 1.0 - ly
    hx = 1.0 - lx
    return (hy * hx * data[y_low, x_low] + hy * lx * data[y_low, x_high]
            + ly * hx * data[y_high, x_low] + ly * lx * data[y_high, x_high])


def bilinear_interpolate(data: np.ndarray, y: float, x: float) -> float:
    """data: [H, W]. torchvision roi_align bilinear sampling of one point."""
    h, w = data.shape
    if y < -1.0 or y > h or x < -1.0 or x > w:
        return 0.0
    y = max(y, 0.0)
    x = max(x, 0.0)
    y_low = int(y)
    x_low = int(x)
    if y_low >= h - 1:
        y_high = y_low = h - 1
        y = float(y_low)
    else:
        y_high = y_low + 1
    if x_low >= w - 1:
        x_high = x_low = w - 1
        x = float(x_low)
    else:
        x_high = x_low + 1
    ly = y - y_low
    lx = x - x_low
    hy = 1.0 - ly
    hx = 1.0 - lx
    return (hy * hx * data[y_low, x_low] + hy * lx * data[y_low, x_high]
            + ly * hx * data[y_high, x_low] + ly * lx * data[y_high, x_high])


def roi_align_oracle(features: np.ndarray, boxes: np.ndarray, output_size: int,
                     spatial_scale: float, sampling_ratio: int) -> np.ndarray:
    """features: [H, W, C]; boxes: [N, 4] xyxy image coords (aligned=False).
    Returns [N, P, P, C]."""
    h, w, c = features.shape
    n = boxes.shape[0]
    out = np.zeros((n, output_size, output_size, c), dtype=np.float64)
    for i in range(n):
        x1, y1, x2, y2 = (float(v) for v in boxes[i])
        start_w = x1 * spatial_scale
        start_h = y1 * spatial_scale
        end_w = x2 * spatial_scale
        end_h = y2 * spatial_scale
        roi_w = max(end_w - start_w, 1.0)
        roi_h = max(end_h - start_h, 1.0)
        bin_w = roi_w / output_size
        bin_h = roi_h / output_size
        count = sampling_ratio * sampling_ratio
        for ph in range(output_size):
            for pw in range(output_size):
                acc = np.zeros((c,), dtype=np.float64)
                for iy in range(sampling_ratio):
                    yy = start_h + ph * bin_h + (iy + 0.5) * bin_h / sampling_ratio
                    for ix in range(sampling_ratio):
                        xx = start_w + pw * bin_w + (ix + 0.5) * bin_w / sampling_ratio
                        for ch in range(c):
                            acc[ch] += bilinear_interpolate(features[:, :, ch], yy, xx)
                out[i, ph, pw] = acc / count
    return out


def roi_align_oracle_fast(features: np.ndarray, boxes: np.ndarray, output_size: int,
                          spatial_scale: float, sampling_ratio: int) -> np.ndarray:
    """Channel-vectorized variant of roi_align_oracle (identical semantics)."""
    n = boxes.shape[0]
    c = features.shape[2]
    out = np.zeros((n, output_size, output_size, c), dtype=np.float64)
    f64 = features.astype(np.float64)
    for i in range(n):
        x1, y1, x2, y2 = (float(v) for v in boxes[i])
        start_w = x1 * spatial_scale
        start_h = y1 * spatial_scale
        roi_w = max(x2 * spatial_scale - start_w, 1.0)
        roi_h = max(y2 * spatial_scale - start_h, 1.0)
        bin_w = roi_w / output_size
        bin_h = roi_h / output_size
        for ph in range(output_size):
            for pw in range(output_size):
                acc = np.zeros((c,), dtype=np.float64)
                for iy in range(sampling_ratio):
                    yy = start_h + ph * bin_h + (iy + 0.5) * bin_h / sampling_ratio
                    for ix in range(sampling_ratio):
                        xx = start_w + pw * bin_w + (ix + 0.5) * bin_w / sampling_ratio
                        acc += bilinear_interpolate_vec(f64, yy, xx)
                out[i, ph, pw] = acc / (sampling_ratio * sampling_ratio)
    return out


def iou_single(a: np.ndarray, b: np.ndarray) -> float:
    area_a = (a[2] - a[0]) * (a[3] - a[1])
    area_b = (b[2] - b[0]) * (b[3] - b[1])
    ix1 = max(a[0], b[0])
    iy1 = max(a[1], b[1])
    ix2 = min(a[2], b[2])
    iy2 = min(a[3], b[3])
    iw = max(ix2 - ix1, 0.0)
    ih = max(iy2 - iy1, 0.0)
    inter = iw * ih
    return inter / (area_a + area_b - inter)


def nms_oracle(boxes: np.ndarray, scores: np.ndarray, iou_threshold: float) -> list[int]:
    """Greedy NMS. Returns kept indices in score-descending order."""
    order = np.argsort(-scores, kind="stable")
    kept: list[int] = []
    for i in order:
        ok = True
        for j in kept:
            if iou_single(boxes[i].astype(np.float64), boxes[j].astype(np.float64)) > iou_threshold:
                ok = False
                break
        if ok:
            kept.append(int(i))
    return kept


def decode_boxes_oracle(deltas: np.ndarray, boxes: np.ndarray,
                        weights=(1.0, 1.0, 1.0, 1.0)) -> np.ndarray:
    """deltas [N, K*4], boxes [N, 4] -> [N, K, 4]."""
    clip = np.log(1000.0 / 16.0)
    n = boxes.shape[0]
    k = deltas.shape[1] // 4
    out = np.zeros((n, k, 4), dtype=np.float64)
    for i in range(n):
        wdt = boxes[i, 2] - boxes[i, 0]
        hgt = boxes[i, 3] - boxes[i, 1]
        cx = boxes[i, 0] + 0.5 * wdt
        cy = boxes[i, 1] + 0.5 * hgt
        for kk in range(k):
            dx = deltas[i, 4 * kk + 0] / weights[0]
            dy = deltas[i, 4 * kk + 1] / weights[1]
            dw = min(deltas[i, 4 * kk + 2] / weights[2], clip)
            dh = min(deltas[i, 4 * kk + 3] / weights[3], clip)
            pcx = dx * wdt + cx
            pcy = dy * hgt + cy
            pw = np.exp(dw) * wdt
            ph = np.exp(dh) * hgt
            out[i, kk] = [pcx - pw / 2, pcy - ph / 2, pcx + pw / 2, pcy + ph / 2]
    return out
