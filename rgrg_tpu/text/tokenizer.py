"""Byte-level BPE tokenizer (GPT-2 algorithm), offline, dependency-free.

The reference uses the HF GPT2Tokenizer of `healx/gpt-2-pubmed-medium`
(train_full_model.py:386-421). This environment has no network access, so
we implement the published GPT-2 byte-level BPE algorithm directly; it loads
the standard `vocab.json` + `merges.txt` files from a local directory and is
drop-in compatible (same ids, same detokenization, pad == bos == eos ==
<|endoftext|> == 50256).

Region phrases are encoded as "<|endoftext|>" + phrase + "<|endoftext|>"
(reference tokenize fn, train_full_model.py:389-395).
"""

from __future__ import annotations

import functools
import json
import os
import re
from typing import Dict, Iterable, List, Sequence

ENDOFTEXT = "<|endoftext|>"

# GPT-2's regex for pre-tokenization (contractions, letters, numbers,
# other). HF tokenization_gpt2.py uses the `regex` module for \p{L}/\p{N};
# it ships with transformers so it is present here. The stdlib-re fallback
# approximates the unicode classes with \w-based ones and is NOT exact for
# '_' (dropped: [^\s\w] excludes it) or non-Nd numerals — hence fallback
# only when `regex` is genuinely missing.
try:
    import regex as _regex
    _PAT = _regex.compile(
        r"""'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+|"""
        r""" ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+""")
except ImportError:  # pragma: no cover - regex ships with transformers
    _PAT = re.compile(
        r"""'s|'t|'re|'ve|'m|'ll|'d| ?[^\W\d_]+| ?\d+| ?[^\s\w]+"""
        r"""|\s+(?!\S)|\s+""", re.UNICODE)


@functools.lru_cache()
def _bytes_to_unicode() -> Dict[int, str]:
    """GPT-2's reversible byte <-> printable-unicode mapping."""
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("\xa1"), ord("\xac") + 1))
          + list(range(ord("\xae"), ord("\xff") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, map(chr, cs)))


def _get_pairs(word: Sequence[str]):
    return {(word[i], word[i + 1]) for i in range(len(word) - 1)}


class GPT2Tokenizer:
    """Minimal, exact GPT-2 BPE. Load with `GPT2Tokenizer.from_dir(path)`
    where path contains vocab.json and merges.txt."""

    def __init__(self, encoder: Dict[str, int], merges: List[tuple]):
        self.encoder = encoder
        self.decoder = {v: k for k, v in encoder.items()}
        self.bpe_ranks = {m: i for i, m in enumerate(merges)}
        self.byte_encoder = _bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        self.cache: Dict[str, str] = {}
        self.eos_token_id = encoder.get(ENDOFTEXT, len(encoder) - 1)
        self.bos_token_id = self.eos_token_id
        self.pad_token_id = self.eos_token_id
        self._decode_table: List[bytes] | None = None  # built lazily
        self._merges = merges
        self._native = None          # C++ encoder, built on first encode
        self._native_tried = False

    def _build_decode_table(self) -> List[bytes]:
        """id -> raw bytes, precomputed once. Serving decodes ~200 sentences
        x 60 tokens per batch on a 1-core host; the per-char dict walk in
        the straightforward decode was the post-stage bottleneck (~0.2 s per
        batch). Semantics are exactly decode()'s: byte-decoder chars map to
        their byte, anything else (special tokens) keeps its utf-8."""
        size = max(self.decoder) + 1 if self.decoder else 0
        table = [b""] * size
        for i, tok in self.decoder.items():
            buf = bytearray()
            for ch in tok:
                if ch in self.byte_decoder:
                    buf.append(self.byte_decoder[ch])
                else:
                    buf.extend(ch.encode("utf-8"))
            table[i] = bytes(buf)
        return table

    # -------------------- construction --------------------

    @classmethod
    def from_dir(cls, path: str) -> "GPT2Tokenizer":
        with open(os.path.join(path, "vocab.json"), encoding="utf-8") as f:
            encoder = json.load(f)
        merges = []
        with open(os.path.join(path, "merges.txt"), encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#version"):
                    continue
                a, b = line.split()
                merges.append((a, b))
        return cls(encoder, merges)

    @classmethod
    def dummy(cls, extra_words: Iterable[str] = ()) -> "GPT2Tokenizer":
        """Tiny self-consistent tokenizer for tests: byte-level vocab (no
        merges) + <|endoftext|>; ids are NOT GPT-2-compatible."""
        byte_vocab = list(_bytes_to_unicode().values())
        encoder = {tok: i for i, tok in enumerate(sorted(byte_vocab))}
        encoder[ENDOFTEXT] = len(encoder)
        return cls(encoder, [])

    # -------------------- BPE core --------------------

    def _bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token)
        pairs = _get_pairs(word)
        if not pairs:
            return token
        while True:
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word: List[str] = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if i < len(word) - 1 and word[i] == first and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = _get_pairs(word)
        out = " ".join(word)
        self.cache[token] = out
        return out

    # -------------------- public API --------------------

    def encode(self, text: str, add_special: bool = False) -> List[int]:
        """Plain text -> ids. With add_special, wraps in eos ids the way the
        reference wraps region phrases.

        ASCII text goes through the C++ encoder when native/librgrg_host.so
        is built (the reference's HF tokenizer is Rust-native; this is the
        host-runtime equivalent) — identical ids by construction, pinned by
        fuzz tests. Non-ASCII text and library-less installs use the Python
        path below."""
        if not self._native_tried:
            self._native_tried = True
            from rgrg_tpu.text.native_bpe import NativeBpe
            self._native = NativeBpe.build(self.encoder, self._merges,
                                           self.byte_encoder)
        if self._native is not None and text.isascii():
            ids = self._native.encode_ascii(text)
            if ids is not None:
                if add_special:
                    ids = [self.bos_token_id] + ids + [self.eos_token_id]
                return ids
        ids = []
        for token in _PAT.findall(text):
            token_bytes = token.encode("utf-8")
            mapped = "".join(self.byte_encoder[b] for b in token_bytes)
            ids.extend(self.encoder[t] for t in self._bpe(mapped).split(" "))
        if add_special:
            ids = [self.bos_token_id] + ids + [self.eos_token_id]
        return ids

    @staticmethod
    def clean_up_tokenization(text: str) -> str:
        """HF PreTrainedTokenizerBase.clean_up_tokenization: undo BPE
        artifacts around punctuation/contractions. The reference decodes
        with clean_up_tokenization_spaces=True (HF<4.45 default;
        generate_reports_for_images.py:118-119), so this is on the greedy
        string-parity critical path."""
        return (text.replace(" .", ".").replace(" ?", "?")
                .replace(" !", "!").replace(" ,", ",")
                .replace(" ' ", "'").replace(" n't", "n't")
                .replace(" 'm", "'m").replace(" 's", "'s")
                .replace(" 've", "'ve").replace(" 're", "'re"))

    def decode(self, ids: Iterable[int], skip_special_tokens: bool = True,
               clean_up_tokenization_spaces: bool = True) -> str:
        if self._decode_table is None:
            self._decode_table = self._build_decode_table()
        table = self._decode_table
        n = len(table)
        eos = self.eos_token_id
        if hasattr(ids, "tolist"):
            ids = ids.tolist()  # one C-level conversion beats per-id int()
        if skip_special_tokens:
            parts = [table[i] for i in ids if 0 <= i < n and i != eos]
        else:
            parts = [table[i] for i in ids if 0 <= i < n]
        out = b"".join(parts).decode("utf-8", errors="replace")
        if clean_up_tokenization_spaces:
            out = self.clean_up_tokenization(out)
        return out

    def batch_decode(self, batch: Iterable[Iterable[int]],
                     skip_special_tokens: bool = True,
                     clean_up_tokenization_spaces: bool = True) -> List[str]:
        return [self.decode(row, skip_special_tokens,
                            clean_up_tokenization_spaces) for row in batch]

    @property
    def vocab_size(self) -> int:
        return len(self.encoder)

    def pad_batch(self, sequences: List[List[int]], max_len: int | None = None):
        """Right-pad to max length; returns (ids [N, L], mask [N, L]) lists.
        Mirrors HF tokenizer.pad with pad_token = eos (custom_collator.py:74-92)."""
        if max_len is None:
            max_len = max((len(s) for s in sequences), default=1)
        ids, mask = [], []
        for s in sequences:
            s = list(s)[:max_len]
            pad = max_len - len(s)
            ids.append(s + [self.pad_token_id] * pad)
            mask.append([1] * len(s) + [0] * pad)
        return ids, mask
