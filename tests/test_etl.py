"""ETL tests with synthetic scene graphs / reports / images."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from rgrg_tpu.data import etl
from rgrg_tpu.data.sections import extract_findings, split_sections


class TestSections:
    REPORT = (
        "                                 FINAL REPORT\n"
        " EXAMINATION:  CHEST (PA AND LAT)\n"
        "\n INDICATION:  Cough and fever.\n"
        "\n COMPARISON:  None.\n"
        "\n FINDINGS: \n"
        " The lungs are clear. The cardiomediastinal silhouette is normal.\n"
        "\n IMPRESSION: \n"
        " No acute cardiopulmonary process.\n")

    def test_split(self):
        secs = split_sections(self.REPORT)
        names = [s.name for s in secs]
        assert "findings" in names and "impression" in names

    def test_extract_findings(self):
        out = extract_findings(self.REPORT, "12345")
        assert out == ("The lungs are clear. The cardiomediastinal "
                       "silhouette is normal.")

    def test_custom_rule_study_skipped(self):
        assert extract_findings(self.REPORT, "50913680") is None
        assert extract_findings(self.REPORT, "50525523") is None

    def test_no_findings_returns_none(self):
        assert extract_findings(" INDICATION: Cough.\n", "1") is None

    def test_typo_normalization(self):
        secs = split_sections("\n FINDNGS:  \n Lungs clear.\n")
        assert any(s.name == "findings" for s in secs)

    def test_empty_findings_dropped(self):
        secs = split_sections("\n FINDINGS: \n\n INDICATION: x.\n")
        # the empty findings section is removed
        assert not any(s.name == "findings" and s.text.strip() for s in secs)


class TestPhraseCleaning:
    def test_boilerplate_removed(self):
        out = etl.clean_phrases(["PORTABLE CHEST RADIOGRAPH: The heart is normal."])
        assert out == "The heart is normal."

    def test_wet_read_removed(self):
        out = etl.clean_phrases(["WET READ: ___ ___ 8:19 AM heart ok PM",
                                 "lungs are clear."])
        assert "WET READ" not in out

    def test_duplicates_removed_and_capitalized(self):
        out = etl.clean_phrases(["the heart is normal. the heart is normal.",
                                 "lungs clear."])
        assert out == "The heart is normal. Lungs clear."

    def test_empty(self):
        assert etl.clean_phrases([""]) == ""

    def test_abnormal_attribute(self):
        assert etl.is_abnormal([["anatomicalfinding|no|lung opacity"],
                                ["nlp|yes|abnormal"]])
        assert not etl.is_abnormal([["nlp|yes|normal"]])


class TestBoxRules:
    def test_faulty(self):
        assert etl.box_faulty(0, 0, 0, 10, 100, 100)      # zero width
        assert etl.box_faulty(-5, -5, -1, 10, 100, 100)   # x2 <= 0
        assert etl.box_faulty(150, 0, 160, 10, 100, 100)  # x1 >= width
        assert not etl.box_faulty(-5, 0, 50, 10, 100, 100)  # partial ok

    def test_clamp(self):
        assert etl.clamp(-3, 100) == 0
        assert etl.clamp(130, 100) == 100
        assert etl.clamp(42, 100) == 42


@pytest.fixture
def synthetic_corpus(tmp_path):
    ci = tmp_path / "chest_imagenome" / "silver_dataset"
    (ci / "scene_graph").mkdir(parents=True)
    (ci / "splits").mkdir()
    mc = tmp_path / "mimic_cxr"
    jp = tmp_path / "mimic_cxr_jpg"
    out = tmp_path / "out"

    rows = [["", "10000032", "55555555", f"img{i}",
             f"files/p10/p10000032/s55555555/img{i}.dcm"] for i in range(3)]
    with open(ci / "splits" / "test.csv", "w") as f:
        f.write("i,subject_id,study_id,dicom_id,path\n")
        for r in rows:
            f.write(",".join(r) + "\n")
    with open(ci / "splits" / "images_to_avoid.csv", "w") as f:
        f.write("dicom_id\nimgX\n")

    report_dir = mc / "files" / "p10" / "p10000032"
    report_dir.mkdir(parents=True)
    (report_dir / "s55555555.txt").write_text(
        "\n FINDINGS: \n The lungs are clear.\n\n IMPRESSION: ok.\n")

    regions = list(etl.ANATOMICAL_REGIONS)
    for i in range(3):
        img_dir = jp / "files" / "p10" / "p10000032" / "s55555555"
        img_dir.mkdir(parents=True, exist_ok=True)
        Image.fromarray(np.zeros((200, 150), np.uint8)).save(img_dir / f"img{i}.jpg")
        n_regions = 29 if i < 2 else 5  # third image lacks regions
        scene = {
            "objects": [{"bbox_name": regions[r], "original_x1": 5,
                         "original_y1": 5, "original_x2": 100, "original_y2": 120}
                        for r in range(n_regions)],
            "attributes": [{"bbox_name": regions[0],
                            "phrases": ["the heart is normal."],
                            "attributes": [["nlp|yes|normal"]]},
                           {"bbox_name": "not a region",
                            "phrases": ["ignored."], "attributes": [[]]}],
        }
        with open(ci / "scene_graph" / f"img{i}_SceneGraph.json", "w") as f:
            json.dump(scene, f)

    return etl.EtlPaths(str(tmp_path / "chest_imagenome"), str(mc), str(jp), str(out))


def test_build_test_split(synthetic_corpus):
    paths = synthetic_corpus
    written = etl.build_split("test", paths, image_ids_to_avoid=set())
    assert len(written) == 2
    import pandas as pd
    main = pd.read_csv(written[0])
    second = pd.read_csv(written[1])
    assert len(main) == 2      # two 29-region images
    assert len(second) == 1    # one 5-region image
    assert main.iloc[0]["reference_report"] == "The lungs are clear."
    import ast
    phrases = ast.literal_eval(main.iloc[0]["bbox_phrases"])
    assert len(phrases) == 29
    assert phrases[0] == "The heart is normal."
    labels = ast.literal_eval(main.iloc[0]["bbox_labels"])
    assert labels == list(range(1, 30))
