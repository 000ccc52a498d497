"""End-to-end inference API tests (tiny decoder, real detector, CPU)."""

import dataclasses

import numpy as np
import cv2
import jax
import pytest

from rgrg_tpu.core import constants as C
from rgrg_tpu.inference import ReportGenerator, write_generated_reports_to_txt
from rgrg_tpu.models.full_model import RGRG
from rgrg_tpu.text.tokenizer import GPT2Tokenizer

from tests.test_full_model import SMOKE_CFG


@pytest.fixture(scope="module")
def generator():
    model = RGRG(cfg=SMOKE_CFG)
    params = model.init(jax.random.PRNGKey(0))
    tok = GPT2Tokenizer.dummy()
    # tiny decoder vocab (50) < dummy tokenizer vocab — decode maps ids it has
    return ReportGenerator(params, tok, cfg=SMOKE_CFG)


@pytest.fixture()
def image(tmp_path):
    p = str(tmp_path / "cxr.png")
    img = (np.random.default_rng(0).uniform(0, 255, (700, 600))).astype(np.uint8)
    cv2.imwrite(p, img)
    return p


def test_generate_reports_greedy(generator, image):
    reps = generator.generate_reports([image, image], num_beams=1, max_length=6)
    assert len(reps) == 2
    r = reps[0]
    assert isinstance(r.report, str)
    assert r.selected_regions.shape == (29,)
    assert r.top_region_boxes.shape == (29, 4)
    assert set(r.region_sentences) <= set(C.REGION_NAMES)
    # every selected region produced a sentence entry
    assert len(r.region_sentences) == int(r.selected_regions.sum())


def test_generate_reports_beam(generator, image):
    reps = generator.generate_reports([image], num_beams=2, max_length=6,
                                      early_stopping=True)
    assert len(reps) == 1


def test_generate_for_regions(generator, image):
    out = generator.generate_for_regions(image, ["spine", "cardiac silhouette"],
                                         num_beams=1, max_length=6)
    assert set(out) <= {"spine", "cardiac silhouette"}
    for v in out.values():
        assert isinstance(v, str)


def test_generate_for_boxes(generator, image):
    boxes = np.array([[10, 10, 200, 200], [100, 100, 400, 300]], np.float32)
    sents = generator.generate_for_boxes(image, boxes, num_beams=1, max_length=6)
    assert len(sents) == 2


def test_write_txt(generator, image, tmp_path):
    reps = generator.generate_reports([image], num_beams=1, max_length=6)
    out = str(tmp_path / "reports.txt")
    write_generated_reports_to_txt([image], reps, out)
    content = open(out).read()
    assert "Image path:" in content and "Generated report:" in content
