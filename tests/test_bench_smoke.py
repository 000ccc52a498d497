"""bench.py control-flow smoke on the tiny model.

The driver executes bench.py at round end on the real TPU; a crash there
loses the round's benchmark. This pins the full calibrate -> certify ->
serve plumbing (including the classifier-driven branch, which exercises
serving's readback path) on CPU with every scale knob shrunk. Timing
numbers are meaningless here — only that every stage runs.
"""

import jax
import numpy as np
import pytest

import bench
from rgrg_tpu.models.full_model import RGRG

from tests.test_full_model import SMOKE_CFG


@pytest.fixture(autouse=True)
def _shrink(monkeypatch):
    monkeypatch.setattr(bench, "BATCH", 4)
    monkeypatch.setattr(bench, "PRODUCT_BATCH", 4)
    monkeypatch.setattr(bench, "PRODUCT_IMAGES", 8)
    monkeypatch.setattr(bench, "REGIONS_PER_IMAGE", 2)
    monkeypatch.setattr(bench, "SENT_TOKENS", 8)


def test_calibrate_certify_and_classifier_driven_product():
    model = RGRG(cfg=SMOKE_CFG)
    params = model.init(jax.random.PRNGKey(0))

    cal = bench.calibrate_selection_threshold(model, params)
    assert np.isfinite(cal.cfg.classifier.logit_threshold)

    # random weights: survivors fill post-NMS capacity, so certification
    # correctly declines (budget None) and serving stays unbudgeted
    budget, served = bench.certify_budget(cal, params)
    assert budget is None or budget < int(
        served.cfg.detector.rpn.post_nms_top_n_test)

    rps = bench.bench_product_classifier_driven(served, params)
    assert rps > 0


def test_certify_parity_dry_run():
    """The one-command real-weight certification plan (VERDICT missing #1)
    must keep dry-running clean so the day the published weights arrive the
    path hasn't rotted (converters, generator, NLG stack all import)."""
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, "scripts/certify_parity.py", "--dry-run"],
        capture_output=True, text=True, timeout=600, cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "wiring OK" in r.stdout
