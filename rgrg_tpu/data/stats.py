"""Dataset statistics utilities.

Reference equivalents:
  - compute_mean_std_dataset.py: streaming pixel mean/std of the train split
    (result 0.471 / 0.302, hardcoded at every transform site);
  - compute_stats_dataset.py: counts that justify the classifier
    pos_weights (~2.2x regions w/o sentence, ~6x normal vs abnormal);
  - compute_cider_document_frequencies.py: CIDEr-D doc frequencies from the
    VALIDATION reference reports (wordpunct + lowercase), cached gzip'd.
"""

from __future__ import annotations

import gzip
import pickle
import re
from typing import Dict, Iterable, Optional, Tuple

import numpy as np

from rgrg_tpu.core import constants as C
from rgrg_tpu.eval import nlg

_WORDPUNCT = re.compile(r"\w+|[^\w\s]+")


def compute_mean_std(image_paths: Iterable[str],
                     tolerance: float = 1e-4,
                     patience: int = 10) -> Tuple[float, float]:
    """Streaming mean/std over normalized [0,1] pixels with convergence
    patience (reference compute_mean_std_dataset.py semantics)."""
    from rgrg_tpu.data.transforms import load_image
    count = 0
    total = 0.0
    total_sq = 0.0
    last = (None, None)
    stable = 0
    for path in image_paths:
        img = load_image(path).astype(np.float64) / 255.0
        count += img.size
        total += img.sum()
        total_sq += (img * img).sum()
        mean = total / count
        std = np.sqrt(total_sq / count - mean * mean)
        if last[0] is not None and abs(mean - last[0]) < tolerance \
                and abs(std - last[1]) < tolerance:
            stable += 1
            if stable >= patience:
                break
        else:
            stable = 0
        last = (mean, std)
    return float(last[0] or 0.0), float(last[1] or 0.0)


def dataset_stats(df) -> Dict[str, float]:
    """Counts over a split dataframe (parsed csv): images, bbox/phrase/
    abnormality ratios — the numbers behind pos_weight 2.2 / 6.0
    (dataset_stats.txt:5-9)."""
    num_images = len(df)
    num_bboxes = int(df["bbox_labels"].apply(len).sum())
    num_with_phrase = int(df["bbox_phrase_exists"].apply(sum).sum())
    num_abnormal = int(df["bbox_is_abnormal"].apply(sum).sum())
    total_slots = num_images * C.NUM_REGIONS
    return {
        "num_images": num_images,
        "num_bboxes": num_bboxes,
        "num_regions_with_sentence": num_with_phrase,
        "num_abnormal_regions": num_abnormal,
        "frac_regions_with_sentence": num_with_phrase / max(total_slots, 1),
        "ratio_without_to_with_sentence":
            (total_slots - num_with_phrase) / max(num_with_phrase, 1),
        "ratio_normal_to_abnormal":
            (total_slots - num_abnormal) / max(num_abnormal, 1),
    }


def wordpunct_lower(text: str):
    """Miura-bugfixed tokenization for CIDEr document frequencies
    (compute_cider_document_frequencies.py:45-67)."""
    return [t.lower() for t in _WORDPUNCT.findall(text)]


def compute_cider_doc_frequencies(reference_reports: Iterable[str],
                                  save_path: Optional[str] = None):
    """df over validation reference reports; optionally cached gzip-pickled
    like the reference's mimic-cxr-document-frequency.bin.gz."""
    refs = [[wordpunct_lower(r)] for r in reference_reports]
    df, log_n = nlg.compute_doc_frequencies(refs)
    if save_path:
        with gzip.open(save_path, "wb") as f:
            pickle.dump({"df": df, "log_num_docs": log_n}, f)
    return df, log_n


def load_cider_doc_frequencies(path: str):
    with gzip.open(path, "rb") as f:
        obj = pickle.load(f)
    return obj["df"], obj["log_num_docs"]
