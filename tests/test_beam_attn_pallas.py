"""Oracle tests for the fused beam-attention Pallas kernel (interpret mode).

The oracle is an independent dense computation: for every query row,
gather the ancestry-selected K/V slots explicitly and run plain softmax
attention — no one-hot contraction shared with either production path.
"""

import numpy as np
import jax
import jax.numpy as jnp

from rgrg_tpu.ops.beam_attn_pallas import ITEM_BLOCK, beam_attention_pallas


def _oracle(qz, k, v, anc_q, k_beams):
    h2, r2, dd = qz.shape
    bk, t = k.shape[1], k.shape[2]
    out = np.zeros((h2, r2, dd), np.float32)
    for h in range(h2):
        for r in range(r2):
            item = r // (2 * k_beams)
            scores = np.full(t, -np.inf, np.float64)
            rows = np.zeros((t, dd), np.float64)
            for tt in range(t):
                a = int(anc_q[r, tt])
                if a < 0:
                    continue
                lane = item * k_beams + a
                scores[tt] = float(np.dot(np.asarray(qz[h, r], np.float64),
                                          np.asarray(k[h, lane, tt], np.float64)))
                rows[tt] = np.asarray(v[h, lane, tt], np.float64)
            scores -= scores.max()
            w = np.exp(scores)
            w /= w.sum()
            out[h, r] = (w[:, None] * rows).sum(0).astype(np.float32)
    return out


def _make(seed, h2=2, items=ITEM_BLOCK * 2, k_beams=4, t=9, dd=16):
    rng = np.random.default_rng(seed)
    bk = items * k_beams
    r2 = 2 * bk
    qz = rng.normal(0, 1, (h2, r2, dd)).astype(np.float32)
    # zero-interleave: row r = (lane*2 + p) keeps only lane-half p
    half = dd // 2
    qz[:, 0::2, half:] = 0.0
    qz[:, 1::2, :half] = 0.0
    k = rng.normal(0, 1, (h2, bk, t, dd)).astype(np.float32)
    v = rng.normal(0, 1, (h2, bk, t, dd)).astype(np.float32)
    # ancestry: visible slots 0..slot get a random ancestor, rest -1
    slot = t - 3
    anc = rng.integers(0, k_beams, (r2, t)).astype(np.int32)
    anc[:, slot + 1:] = -1
    return qz, k, v, anc


def test_kernel_matches_dense_oracle():
    qz, k, v, anc = _make(0)
    got = np.asarray(beam_attention_pallas(
        jnp.asarray(qz), jnp.asarray(k), jnp.asarray(v), jnp.asarray(anc),
        k_beams=4, interpret=True))
    want = _oracle(qz, k, v, anc, 4)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_kernel_multi_block_and_beam_width():
    for k_beams, items, seed in ((2, ITEM_BLOCK * 3, 1), (4, ITEM_BLOCK, 2)):
        qz, k, v, anc = _make(seed, items=items, k_beams=k_beams)
        got = np.asarray(beam_attention_pallas(
            jnp.asarray(qz), jnp.asarray(k), jnp.asarray(v), jnp.asarray(anc),
            k_beams=k_beams, interpret=True))
        want = _oracle(qz, k, v, anc, k_beams)
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_no_image_slot_masked():
    # anc_q[:, 0] = -1 (no_image): slot 0 must get zero weight
    qz, k, v, anc = _make(3)
    anc[:, 0] = -1
    got = np.asarray(beam_attention_pallas(
        jnp.asarray(qz), jnp.asarray(k), jnp.asarray(v), jnp.asarray(anc),
        k_beams=4, interpret=True))
    want = _oracle(qz, k, v, anc, 4)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
