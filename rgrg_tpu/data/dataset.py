"""CSV-backed datasets + static-shape batch assembly (host side).

Replaces the reference's torch Dataset/Collator stack
(custom_image_dataset_object_detector.py, custom_dataset.py,
custom_collator.py) with a torch-free pipeline that emits the fixed-shape
batch dict the jitted train/eval steps consume:

  images            [B, S, S, 1] float32
  gt_boxes          [B, 29, 4]   (zero rows where absent)
  gt_labels         [B, 29]      (1..29; 0 where absent)
  gt_valid          [B, 29]      bool
  input_ids         [B, 29, L]   (pad-token rows where absent)
  attention_mask    [B, 29, L]
  region_has_sentence [B, 29]    bool
  region_is_abnormal  [B, 29]    bool

The reference pads the token batch to the batch max; static shapes need a
fixed L — we bucket to `seq_len` (reference sentences are <60 tokens for
~95% of data, run_configurations.py:50-51; truncation beyond is logged).
Bad samples (unreadable image etc.) are skipped like the reference's
None-filtering collator (defensive continuation, SURVEY.md §4).
"""

from __future__ import annotations

import ast
import dataclasses
import logging
from itertools import islice
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np
import pandas as pd

from rgrg_tpu.core import constants as C
from rgrg_tpu.data import transforms as T
from rgrg_tpu.text.tokenizer import GPT2Tokenizer

log = logging.getLogger(__name__)

CSV_USECOLS_TRAIN = ["mimic_image_file_path", "bbox_coordinates", "bbox_labels",
                     "bbox_phrases", "bbox_phrase_exists", "bbox_is_abnormal"]


def read_split_csv(path: str, usecols: Optional[Sequence[str]] = None,
                   nrows: Optional[int] = None) -> pd.DataFrame:
    """Reads a split csv produced by the ETL (same schema as the reference's
    create_dataset.py output), parsing the python-literal list columns."""
    df = pd.read_csv(path, usecols=usecols, nrows=nrows)
    for col in ("bbox_coordinates", "bbox_labels", "bbox_phrases",
                "bbox_phrase_exists", "bbox_is_abnormal"):
        if col in df.columns:
            df[col] = df[col].apply(ast.literal_eval)
    return df


@dataclasses.dataclass
class Sample:
    image: np.ndarray                 # [S, S, 1] float32
    gt_boxes: np.ndarray              # [29, 4]
    gt_labels: np.ndarray             # [29]
    gt_valid: np.ndarray              # [29] bool
    phrases: Optional[List[str]] = None      # 29 strings ("" = none)
    has_sentence: Optional[np.ndarray] = None
    is_abnormal: Optional[np.ndarray] = None
    reference_report: Optional[str] = None


def row_to_sample(row, train: bool, rng: Optional[np.random.Generator],
                  tcfg: T.TransformConfig = T.TransformConfig()) -> Optional[Sample]:
    try:
        image = T.load_image(row["mimic_image_file_path"])
    except Exception as e:  # bad sample -> skip (reference returns None)
        log.warning("skipping unreadable image %s: %s",
                    row.get("mimic_image_file_path"), e)
        return None

    boxes = np.asarray(row["bbox_coordinates"], np.float32).reshape(-1, 4)
    labels = np.asarray(row["bbox_labels"], np.int32)

    if train:
        # keep: boxes pushed fully outside by Affine are dropped, shrinking
        # the box/label lists in lockstep (albumentations bbox filtering,
        # reference custom_image_dataset_object_detector.py:33-37) — the
        # region simply has no gt that step (gt_valid stays False)
        image, boxes, keep = T.train_transform(image, boxes, rng, tcfg)
        labels = labels[keep]
    else:
        image, boxes = T.val_transform(image, boxes, tcfg)

    # scatter into fixed 29-slot arrays by label (labels are 1..29, unique)
    gt_boxes = np.zeros((C.NUM_REGIONS, 4), np.float32)
    gt_labels = np.zeros((C.NUM_REGIONS,), np.int32)
    gt_valid = np.zeros((C.NUM_REGIONS,), bool)
    for b, l in zip(boxes, labels):
        slot = int(l) - 1
        gt_boxes[slot] = b
        gt_labels[slot] = l
        gt_valid[slot] = True

    sample = Sample(image=image.astype(np.float32), gt_boxes=gt_boxes,
                    gt_labels=gt_labels, gt_valid=gt_valid)
    if "bbox_phrases" in row:
        sample.phrases = list(row["bbox_phrases"])
        sample.has_sentence = np.asarray(row["bbox_phrase_exists"], bool)
        sample.is_abnormal = np.asarray(row["bbox_is_abnormal"], bool)
    if "reference_report" in row:
        sample.reference_report = row["reference_report"]
    return sample


class RGRGDataset:
    """Indexable dataset over a split dataframe."""

    def __init__(self, df: pd.DataFrame, tokenizer: Optional[GPT2Tokenizer],
                 train: bool, seq_len: int = 64, seed: int = 42,
                 tcfg: T.TransformConfig = T.TransformConfig()):
        self.df = df.reset_index(drop=True)
        self.tokenizer = tokenizer
        self.train = train
        self.seq_len = seq_len
        self.tcfg = tcfg
        self.seed = seed
        self.rng = np.random.default_rng(seed)
        self._epoch = 0

    def __len__(self) -> int:
        return len(self.df)

    def __getitem__(self, idx: int) -> Optional[Sample]:
        return row_to_sample(self.df.iloc[idx], self.train,
                             self.rng if self.train else None, self.tcfg)

    def tokenize_phrases(self, phrases: List[str]):
        """'<|endoftext|>' + phrase + '<|endoftext|>' per region
        (train_full_model.py:389-395), padded/truncated to seq_len."""
        ids = np.full((C.NUM_REGIONS, self.seq_len),
                      self.tokenizer.pad_token_id, np.int32)
        mask = np.zeros((C.NUM_REGIONS, self.seq_len), np.float32)
        for r, phrase in enumerate(phrases):
            toks = self.tokenizer.encode(phrase, add_special=True)[:self.seq_len]
            ids[r, :len(toks)] = toks
            mask[r, :len(toks)] = 1.0
        return ids, mask

    def batches(self, batch_size: int, shuffle: bool = False,
                drop_last: bool = True,
                workers: int = 0) -> Iterator[Dict[str, np.ndarray]]:
        """workers > 0 builds samples on a thread pool (cv2 decode/warp
        release the GIL), the analogue of the reference DataLoader's
        num_workers (train_full_model.py:320-327). Augmentation rngs are
        then derived per (seed, epoch, index) SeedSequence so results are
        deterministic regardless of thread scheduling — a different (but
        equally seeded) stream than the workers=0 shared-generator path,
        just as torch worker seeding differs from in-process loading."""
        order = np.arange(len(self))
        if shuffle:
            self.rng.shuffle(order)
        samples = (self._parallel_samples(order, workers) if workers > 0
                   else (self[int(idx)] for idx in order))
        buf: List[Sample] = []
        for s in samples:
            if s is None:
                continue
            buf.append(s)
            if len(buf) == batch_size:
                yield self._collate(buf)
                buf = []
        if buf and not drop_last:
            yield self._collate(buf)

    def _parallel_samples(self, order: np.ndarray,
                          workers: int) -> Iterator[Optional[Sample]]:
        """Ordered sample construction with a bounded in-flight window
        (workers * 2) so an epoch never materializes ahead of the
        consumer."""
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        epoch = self._epoch
        self._epoch += 1

        def build(idx: int) -> Optional[Sample]:
            rng = (np.random.default_rng(
                np.random.SeedSequence([self.seed, epoch, int(idx)]))
                if self.train else None)
            return row_to_sample(self.df.iloc[int(idx)], self.train, rng,
                                 self.tcfg)

        with ThreadPoolExecutor(workers) as ex:
            pending = deque()
            it = iter(order.tolist())
            for idx in list(islice(it, workers * 2)):
                pending.append(ex.submit(build, idx))
            while pending:
                s = pending.popleft().result()
                nxt = next(it, None)
                if nxt is not None:
                    pending.append(ex.submit(build, nxt))
                yield s

    def _collate(self, samples: List[Sample]) -> Dict[str, np.ndarray]:
        batch = {
            "images": np.stack([s.image for s in samples]),
            "gt_boxes": np.stack([s.gt_boxes for s in samples]),
            "gt_labels": np.stack([s.gt_labels for s in samples]),
            "gt_valid": np.stack([s.gt_valid for s in samples]),
        }
        if samples[0].phrases is not None and self.tokenizer is not None:
            ids, mask = zip(*(self.tokenize_phrases(s.phrases) for s in samples))
            batch["input_ids"] = np.stack(ids)
            batch["attention_mask"] = np.stack(mask)
            batch["region_has_sentence"] = np.stack([s.has_sentence for s in samples])
            batch["region_is_abnormal"] = np.stack([s.is_abnormal for s in samples])
        if samples[0].reference_report is not None:
            batch["reference_reports"] = [s.reference_report for s in samples]
        if samples[0].phrases is not None:
            batch["reference_phrases"] = [s.phrases for s in samples]
        return batch
