"""Evaluator driver tests with the tiny model."""

import numpy as np
import cv2
import jax
import pytest

from rgrg_tpu.core import constants as C
from rgrg_tpu.eval.evaluator import (BinaryMetrics, DetectorMetrics,
                                     evaluate_bbox_variations, evaluate_model,
                                     perturb_boxes)
from rgrg_tpu.models.full_model import RGRG
from rgrg_tpu.text.tokenizer import GPT2Tokenizer

from tests.test_full_model import SMOKE_CFG
from tests.test_ops import random_boxes


class TestAccumulators:
    def test_detector_metrics_iou(self):
        m = DetectorMetrics()
        pred = np.zeros((1, 29, 4))
        gt = np.zeros((1, 29, 4))
        pred[0, 0] = [0, 0, 10, 10]
        gt[0, 0] = [0, 0, 10, 20]     # inter 100, union 200
        detected = np.zeros((1, 29), bool)
        detected[0, 0] = True
        valid = detected.copy()
        m.update(pred, detected, gt, valid)
        out = m.compute()
        assert out["per_region_iou"]["right lung"] == pytest.approx(0.5)
        assert out["avg_detections_per_image"] == 1.0

    def test_binary_metrics(self):
        m = BinaryMetrics()
        pred = np.array([[True, True, False, False]])
        targ = np.array([[True, False, True, False]])
        mask = np.ones((1, 4), bool)
        m.update(pred, targ, mask)
        out = m.compute()
        assert out["precision"] == pytest.approx(0.5)
        assert out["recall"] == pytest.approx(0.5)

    def test_mask_excludes(self):
        m = BinaryMetrics()
        pred = np.array([[True]])
        targ = np.array([[False]])
        m.update(pred, targ, np.array([[False]]))
        assert m.compute() == {"precision": 0.0, "recall": 0.0, "f1": 0.0}

    def test_selection_subsets_match_reference_indexing(self):
        """The selection metrics must reproduce the reference's semantics
        (evaluate_model.py:197-213, ADVICE r2 #1): detection gating lives in
        the PREDICTION only (selected_regions[~class_detected]=False), the
        normal/abnormal subsets boolean-index BOTH sides by
        region_is_abnormal, and an undetected region with a gt sentence is
        a FN — not a dropped cell. Oracle: sklearn binary P/R/F1 over the
        reference's exact indexing."""
        from sklearn.metrics import precision_recall_fscore_support

        rng = np.random.default_rng(3)
        raw_sel = rng.uniform(size=(8, 29)) > 0.5
        class_detected = rng.uniform(size=(8, 29)) > 0.3
        has_sent = rng.uniform(size=(8, 29)) > 0.5
        abnormal = rng.uniform(size=(8, 29)) > 0.8
        # model-side gating, as in detector.py:282 / the reference model
        selected = raw_sel & class_detected
        # at least one undetected region WITH a gt sentence must exist so
        # the FN semantics are actually exercised
        assert ((~class_detected) & has_sent).any()

        subsets = {"all": np.ones_like(abnormal),
                   "normal": ~abnormal, "abnormal": abnormal}
        for name, subset in subsets.items():
            m = BinaryMetrics()
            m.update(selected, has_sent, subset)
            got = m.compute()
            p, r, f1, _ = precision_recall_fscore_support(
                has_sent[subset], selected[subset], average="binary",
                zero_division=0)
            assert got["precision"] == pytest.approx(p), name
            assert got["recall"] == pytest.approx(r), name
            assert got["f1"] == pytest.approx(f1), name


class TestPerturb:
    def test_zero_std_identity(self):
        boxes = random_boxes(10)[None]
        out = perturb_boxes(boxes, np.random.default_rng(0), "position", 0.0)
        np.testing.assert_allclose(out, np.clip(boxes, 0, 512), atol=1e-4)

    @pytest.mark.parametrize("mode", ["position", "scale", "aspect"])
    def test_modes_change_boxes(self, mode):
        boxes = random_boxes(10)[None]
        out = perturb_boxes(boxes, np.random.default_rng(0), mode, 0.5)
        assert np.abs(out - boxes).max() > 1.0
        assert (out[..., 2] > out[..., 0]).all()
        assert (out >= 0).all() and (out <= 512).all()

    def test_aspect_preserves_area_roughly(self):
        boxes = np.array([[[100, 100, 300, 200]]], np.float32)
        out = perturb_boxes(boxes, np.random.default_rng(1), "aspect", 0.3)
        a0 = (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])
        a1 = (out[..., 2] - out[..., 0]) * (out[..., 3] - out[..., 1])
        np.testing.assert_allclose(a1, a0, rtol=0.05)  # clipping aside


@pytest.fixture(scope="module")
def tiny_setup():
    model = RGRG(cfg=SMOKE_CFG)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    batches = []
    for _ in range(2):
        boxes = np.stack([random_boxes(29, rng=rng)])
        batches.append({
            "images": rng.normal(0, 0.3, (1, 512, 512, 1)).astype(np.float32),
            "gt_boxes": boxes,
            "gt_labels": np.tile(np.arange(1, 30), (1, 1)),
            "gt_valid": np.ones((1, 29), bool),
            "region_has_sentence": np.tile(
                (np.arange(29) % 3 == 0)[None], (1, 1)),
            "region_is_abnormal": np.zeros((1, 29), bool),
            "reference_phrases": [["The heart is normal." if r % 3 == 0 else ""
                                   for r in range(29)]],
            "reference_reports": ["The heart is normal."],
        })
    return model, params, batches


def test_evaluate_model_full(tiny_setup, tmp_path):
    model, params, batches = tiny_setup
    art = str(tmp_path / "artifacts")
    out = evaluate_model(model, params, batches, GPT2Tokenizer.dummy(),
                         max_length=6, artifacts_dir=art, step=7,
                         num_figure_images=1)
    assert "object_detector" in out
    assert 0 <= out["object_detector"]["avg_detections_per_image"] <= 29
    # all/normal/abnormal selection subsets (evaluate_model.py:332-357)
    assert set(out["region_selection"]) == {"all", "normal", "abnormal"}
    for subset in out["region_selection"].values():
        assert set(subset) == {"precision", "recall", "f1"}
    # language outputs present (selection may vary with random weights)
    if "report" in out:
        assert "bleu_1" in out["report"]

    # txt/figure artifacts (evaluate_language_model.py:511-578)
    import os
    figs = os.listdir(os.path.join(art, "figures"))
    assert any(f.startswith("step7_img0_") for f in figs)
    sent_file = os.path.join(art, "generated_sentences",
                             "generated_sentences_step_7.txt")
    if os.path.exists(sent_file):  # written only when sentences were scored
        body = open(sent_file).read()
        assert "Generated sentence:" in body and "Reference sentence:" in body
    rep_file = os.path.join(art, "generated_reports",
                            "generated_reports_step_7.txt")
    if os.path.exists(rep_file):
        body = open(rep_file).read()
        assert "Generated report:" in body
        assert "Generated sentences with their regions:" in body
        assert "Generated sentences that were removed:" in body


def test_evaluate_model_cascade_bailout_telemetry(tiny_setup):
    """Low observed rung-1 closure must flip the evaluator to direct
    max_length decode for later batches and surface the telemetry
    (VERDICT r4 #4: the cascade's worst case is 1.37x slower than
    full-length decode; beam_eval_cascade.json)."""
    import dataclasses

    from rgrg_tpu.serving import CascadeStats

    model, params, batches = tiny_setup
    # a multi-rung ladder (4, 8): with max_length below the first config
    # bucket the ladder collapses to one rung and closure is undefined
    cfg = dataclasses.replace(
        model.cfg, generation=dataclasses.replace(
            model.cfg.generation, length_buckets=(4,)))
    model = RGRG(cfg=cfg)
    # threshold > 1: ANY observed closure rate counts as below break-even,
    # so the bail-out must engage after batch 1 (min_rows=1)
    stats = CascadeStats(threshold=1.1, min_rows=1)
    out = evaluate_model(model, params, batches, GPT2Tokenizer.dummy(),
                         max_length=8, cascade_stats=stats)
    lg = out["language_generation"]
    assert lg["cascade"]["bailed_out"]
    assert lg["cascade"]["rows_selected"] >= 1
    assert lg["language_images"] == len(batches)
    assert lg["decode_seconds"] > 0
    assert lg["reports_per_sec_decode"] > 0

    # telemetry off: no snapshot, outputs otherwise intact
    out_off = evaluate_model(model, params, batches, GPT2Tokenizer.dummy(),
                             max_length=8, cascade_stats=None)
    assert out_off["language_generation"]["cascade"] is None


def test_validation_losses_per_module(tiny_setup):
    from rgrg_tpu.core.config import TrainConfig
    from rgrg_tpu.eval.evaluator import validation_losses
    model, params, batches = tiny_setup
    # SMOKE_CFG params lack train-time extras? use stage-2 losses on the
    # same tiny model (compute_losses runs detector+selection+abnormal+LM)
    out = validation_losses(model, params, iter(batches), stage=2,
                            tcfg=TrainConfig(grad_accumulation_steps=1),
                            lm_budget=8, max_batches=1)
    assert "total" in out and len(out) > 1
    for v in out.values():
        assert np.isfinite(v)


def test_write_final_scores_format(tmp_path):
    from rgrg_tpu.eval.artifacts import write_final_scores
    scores = {
        "object_detector": {
            "avg_detections_per_image": 28.5, "avg_iou": 0.8,
            "per_region_iou": {"right lung": 0.9},
            "per_region_detection_freq": {"right lung": 1.0}},
        "region_selection": {"all": {"precision": 1.0, "recall": 0.5, "f1": 0.6},
                             "normal": {"precision": 0.9, "recall": 0.4, "f1": 0.5},
                             "abnormal": {"precision": 0.8, "recall": 0.3, "f1": 0.4}},
        "region_abnormal": {"precision": 0.7, "recall": 0.2, "f1": 0.3},
        "report": {"bleu_1": 0.4, "CE": {"precision_micro_5": 0.5,
                                         "Cardiomegaly": {"precision": 0.6}}},
        "sentence": {"meteor": 0.2, "per_region_meteor": {"right lung": 0.25}},
    }
    p = str(tmp_path / "final_scores.txt")
    write_final_scores(scores, p)
    body = open(p).read()
    # reference key spellings (test_set_evaluation.py:77-177)
    assert "avg_num_detected_regions_per_image: 28.50000" in body
    assert "num_detected_right_lung: 1.00000" in body
    assert "iou_right_lung: 0.90000" in body
    assert "region_select_all_precision: 1.00000" in body
    assert "region_select_abnormal_f1: 0.40000" in body
    assert "region_abnormal_recall: 0.20000" in body
    assert "report_CE_precision_micro_5: 0.50000" in body
    assert "report_CE_cardiomegaly_precision: 0.60000" in body
    assert "report_bleu_1: 0.40000" in body
    assert "sentence_meteor: 0.20000" in body
    assert "sentence_meteor_right_lung: 0.25000" in body


def test_bbox_variations(tiny_setup):
    model, params, batches = tiny_setup
    res = evaluate_bbox_variations(model, params, batches, GPT2Tokenizer.dummy(),
                                   mode="position", stds=[0.0, 0.5],
                                   max_length=6)
    assert set(res) == {0.0, 0.5}
    for v in res.values():
        assert 0.0 <= v <= 1.0
