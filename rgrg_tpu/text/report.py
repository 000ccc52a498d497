"""Report assembly: sentence splitting + exact & soft dedup (host side).

Reference behavior (generate_reports_for_images.py:42-104):
  1. join per-region generated sentences with spaces,
  2. sentence-split (spacy in the reference; a rule-based splitter here —
     generated region sentences are simple declaratives ending in '.'),
  3. exact dedup via insertion-ordered dict,
  4. soft dedup: pairwise BERTScore-F1 > 0.9 removes the SHORTER sentence
     (ties remove the first), with the reference's exact loop semantics —
     once sentence i is marked removed its inner loop breaks; removed j's
     are skipped.

The similarity scorer is pluggable and receives ALL candidate pairs at once
(one batched encoder call) — the reference calls the scorer once per pair
(O(n^2) model invocations), a known inefficiency fixed here without changing
results.
"""

from __future__ import annotations

import re
from collections import defaultdict
from typing import Callable, List, Optional, Sequence, Tuple

# split after . ! ? when followed by whitespace + a plausible sentence start
# (uppercase letter, digit, or end); avoids splitting decimals like "1.5 cm"
_SENT_BOUNDARY = re.compile(r"(?<=[.!?])\s+(?=[A-Z0-9(])")


def split_sentences(text: str) -> List[str]:
    text = text.strip()
    if not text:
        return []
    return [s for s in _SENT_BOUNDARY.split(text) if s]


SimilarityFn = Callable[[List[Tuple[str, str]]], List[float]]


def remove_duplicate_sentences(sentences: Sequence[str],
                               similarity_fn: Optional[SimilarityFn] = None,
                               threshold: float = 0.9,
                               return_removed: bool = False):
    """Exact + soft dedup with the reference's removal-loop semantics.

    return_removed=True additionally returns {kept_sentence: [removed
    similar sentences]} — the reference's removed_similar_generated_sentences
    artifact (generate_reports_for_images.py:60-96)."""
    sents = list(dict.fromkeys(sentences))  # ordered exact dedup
    if similarity_fn is None or len(sents) < 2:
        return (sents, {}) if return_removed else sents

    pairs = [(sents[i], sents[j])
             for i in range(len(sents)) for j in range(i + 1, len(sents))]
    scores = similarity_fn(pairs)
    score = {}
    k = 0
    for i in range(len(sents)):
        for j in range(i + 1, len(sents)):
            score[(i, j)] = scores[k]
            k += 1

    removed = defaultdict(list)

    def is_removed(s: str) -> bool:
        return any(s in v for v in removed.values())

    for i in range(len(sents)):
        s1 = sents[i]
        for j in range(i + 1, len(sents)):
            if is_removed(s1):
                break
            s2 = sents[j]
            if is_removed(s2):
                continue
            if score[(i, j)] > threshold:
                # remove the shorter (equal lengths remove s1, matching the
                # reference's `len(s1) > len(s2)` branch)
                if len(s1) > len(s2):
                    removed[s1].append(s2)
                else:
                    removed[s2].append(s1)

    kept = [s for s in sents if not is_removed(s)]
    return (kept, dict(removed)) if return_removed else kept


def assemble_report(region_sentences: Sequence[str],
                    similarity_fn: Optional[SimilarityFn] = None,
                    threshold: float = 0.9,
                    return_removed: bool = False):
    """Per-region generated sentences -> deduplicated report string."""
    joined = " ".join(s for s in region_sentences if s)
    sents = split_sentences(joined)
    if return_removed:
        kept, removed = remove_duplicate_sentences(
            sents, similarity_fn, threshold, return_removed=True)
        return " ".join(kept), removed
    return " ".join(remove_duplicate_sentences(sents, similarity_fn, threshold))
