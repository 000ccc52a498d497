"""Training-time target assignment and balanced sampling, static shapes.

Implements the Faster R-CNN matcher / balanced fg-bg sampler semantics the
reference inherits from torchvision (SURVEY.md §7 "hard parts" #6):

  - Matcher(high, low, allow_low_quality_matches): per-anchor best gt;
    below-low -> background (-1), between -> discard (-2); low-quality
    force-match restores each gt's argmax-tied anchors to their own best gt
    (including torchvision's quirk of restoring the ORIGINAL best match,
    which may differ from the tying gt).
  - BalancedPositiveNegativeSampler: up to `batch*frac` random positives,
    negatives fill the remainder.

Everything is fixed-shape: dynamic candidate counts become boolean masks and
rank-based random subset selection (argsort of random keys) instead of
torch's randperm-and-slice.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from rgrg_tpu.ops.boxes import box_iou

BELOW_LOW = -1
BETWEEN = -2


class MatchResult(NamedTuple):
    matched_idx: jnp.ndarray   # [N] int32: gt index (>=0), or -1/-2 sentinel
    matched_vals: jnp.ndarray  # [N] best IoU per anchor


def match_anchors(gt_boxes: jnp.ndarray, gt_valid: jnp.ndarray,
                  anchors: jnp.ndarray, high: float, low: float,
                  allow_low_quality: bool) -> MatchResult:
    """gt_boxes: [G, 4] (padded), gt_valid: [G] bool, anchors: [N, 4]."""
    iou = box_iou(gt_boxes, anchors)                     # [G, N]
    iou = jnp.where(gt_valid[:, None], iou, -1.0)        # invalid gts never match

    matched_vals = jnp.max(iou, axis=0)                  # [N]
    matches = jnp.argmax(iou, axis=0).astype(jnp.int32)  # [N] first max wins
    all_matches = matches

    matches = jnp.where(matched_vals < low, BELOW_LOW, matches)
    matches = jnp.where((matched_vals >= low) & (matched_vals < high),
                        BETWEEN, matches)

    if allow_low_quality:
        # anchors tying each gt's best IoU are restored to their ORIGINAL match
        # (torchvision restores even zero-IoU ties; invalid gt rows are
        # excluded by gt_valid)
        highest_per_gt = jnp.max(iou, axis=1, keepdims=True)       # [G, 1]
        is_best_for_some_gt = jnp.any(
            (iou == highest_per_gt) & gt_valid[:, None], axis=0)   # [N]
        matches = jnp.where(is_best_for_some_gt, all_matches, matches)

    return MatchResult(matches, matched_vals)


def _random_subset_mask(rng: jax.Array, eligible: jnp.ndarray,
                        budget: jnp.ndarray) -> jnp.ndarray:
    """Uniformly select min(count(eligible), budget) of the eligible entries.

    Returns a bool mask. budget may be a traced scalar.
    """
    n = eligible.shape[0]
    key = jax.random.uniform(rng, (n,))
    key = jnp.where(eligible, key, jnp.inf)
    order = jnp.argsort(key)                 # eligible entries first, random order
    rank = jnp.zeros((n,), jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))
    return eligible & (rank < budget)


def sample_pos_neg(rng: jax.Array, labels: jnp.ndarray,
                   batch_size: int, positive_fraction: float):
    """labels: [N] float (1=pos, 0=neg, -1=discard) per torchvision
    convention. Returns (pos_mask, neg_mask) with
    |pos| = min(#pos, batch*frac), |neg| = min(#neg, batch - |pos|)."""
    r_pos, r_neg = jax.random.split(rng)
    positive = labels >= 1
    negative = labels == 0
    max_pos = jnp.int32(batch_size * positive_fraction)
    num_pos = jnp.minimum(jnp.sum(positive), max_pos)
    pos_mask = _random_subset_mask(r_pos, positive, num_pos)
    num_neg = jnp.minimum(jnp.sum(negative), batch_size - num_pos)
    neg_mask = _random_subset_mask(r_neg, negative, num_neg)
    return pos_mask, neg_mask
