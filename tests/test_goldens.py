"""Golden regression tests: fixed-seed model outputs vs stored snapshots.

These catch unintended numeric drift across refactors (the oracle tests
verify semantics; these pin the actual values). Regenerate deliberately
with: python tests/test_goldens.py regen
"""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "goldens.npz")


def _compute():
    from rgrg_tpu.decode.greedy import greedy_generate
    from rgrg_tpu.models import gpt2
    from rgrg_tpu.models.full_model import RGRG
    from tests.test_full_model import SMOKE_CFG
    from tests.test_gpt2 import TINY

    out = {}

    model = RGRG(cfg=SMOKE_CFG)
    params = model.init(jax.random.PRNGKey(0))
    images = jax.random.normal(jax.random.PRNGKey(1), (1, 512, 512, 1)) * 0.3
    det = model.detect(params, images)
    out["det_top_scores"] = np.asarray(det["top_scores"][0])
    out["det_class_detected"] = np.asarray(det["class_detected"][0])
    out["det_selection_logits"] = np.asarray(det["selection_logits"][0])
    out["det_boxes"] = np.asarray(det["top_region_boxes"][0])

    dec = gpt2.init_decoder_params(jax.random.PRNGKey(7), TINY)
    feats = jax.random.normal(jax.random.PRNGKey(8), (3, TINY.hidden_dim))
    out["greedy_ids"] = np.asarray(greedy_generate(dec, feats, TINY,
                                                   max_length=12))
    logits = gpt2.forward_full(dec, jnp.asarray([[1, 2, 3, 4]]),
                               jnp.ones((1, 4)), feats[:1], TINY)
    out["lm_logits_slice"] = np.asarray(logits[0, -1, :8])
    return out


def test_goldens():
    if not os.path.exists(GOLDEN_PATH):
        import pytest
        pytest.skip("goldens.npz not generated")
    want = np.load(GOLDEN_PATH)
    got = _compute()
    np.testing.assert_array_equal(got["det_class_detected"],
                                  want["det_class_detected"])
    np.testing.assert_array_equal(got["greedy_ids"], want["greedy_ids"])
    for key in ("det_top_scores", "det_selection_logits", "det_boxes",
                "lm_logits_slice"):
        np.testing.assert_allclose(got[key], want[key], rtol=5e-4, atol=5e-4,
                                   err_msg=key)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "regen":
        np.savez(GOLDEN_PATH, **_compute())
        print(f"wrote {GOLDEN_PATH}")
