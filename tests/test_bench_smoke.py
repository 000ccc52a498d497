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


def test_headline_canary_and_detect_roofline():
    """New r5 bench plumbing: tunnel canaries, the canary-bracketed
    headline retry wrapper, and the per-stage detector roofline must all
    run on CPU (the driver executes them on the real chip at round end —
    a crash there loses the round's benchmark)."""
    model = RGRG(cfg=SMOKE_CFG)
    params = model.init(jax.random.PRNGKey(0))

    c = bench.tunnel_canary()
    assert c["roundtrip_ms"] >= 0 and c["upload_32mb_ms"] >= 0
    assert isinstance(bench.canary_is_fast(c), bool)

    best, attempts = bench.measure_headline_product(
        model, params, max_attempts=1, configs=((4, None), (4, 2)))
    assert set(best["by_config"]) == {"B4", "B4c2"}
    assert all(v > 0 for v in best["by_config"].values())
    assert attempts and attempts[0]["pre_canary"]["roundtrip_ms"] >= 0

    det = bench.bench_roofline_detect(model, params)
    assert det["full_detect_ms"] >= 0
    assert set(det["stages"]) == {"backbone", "rpn_nms", "roi_pool",
                                  "box_head", "remainder"}
    for st in det["stages"].values():
        assert st["ms"] >= 0


def test_beam_product_image_chunk():
    """Chunked detect composed with the beam product path (the rows-curve
    probe drives B>=96 through this; scripts/bench_beam_rows.py)."""
    model = RGRG(cfg=SMOKE_CFG)
    params = model.init(jax.random.PRNGKey(0))
    rps = bench.bench_beam4_product(model, params, batch=4, image_chunk=2)
    assert rps > 0


def test_eval_rehearsal_setup_helpers():
    """The TPU eval dress rehearsal's synthetic inputs must stay loadable by
    the real data/tokenizer stacks (scripts/eval_rehearsal.py)."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "eval_rehearsal", "/root/repo/scripts/eval_rehearsal.py")
    er = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(er)

    import tempfile

    from rgrg_tpu.data.dataset import RGRGDataset, read_split_csv
    from rgrg_tpu.text.tokenizer import GPT2Tokenizer

    with tempfile.TemporaryDirectory() as td:
        tok_dir = os.path.join(td, "tok")
        er.make_tokenizer_dir(tok_dir, vocab_size=300, eos_id=299)
        tok = GPT2Tokenizer.from_dir(tok_dir)
        assert tok.eos_token_id == 299
        ids = tok.encode("The heart is normal.")
        assert tok.decode(ids) == "The heart is normal."
        # filler ids decode to printable ASCII (any sampled id is decodable)
        assert tok.decode([260]) == "tok260"

        csv_path = os.path.join(td, "test.csv")
        er.make_split_csv(csv_path, os.path.join(td, "imgs"), n=3, seed=0)
        ds = RGRGDataset(read_split_csv(csv_path), tok, train=False,
                         seq_len=16)
        b = next(iter(ds.batches(batch_size=2, drop_last=True)))
        assert b["images"].shape == (2, 512, 512, 1)
        assert b["input_ids"].shape == (2, 29, 16)
