"""Tokenizer and report-assembly tests."""

import numpy as np
import pytest

from rgrg_tpu.text.tokenizer import GPT2Tokenizer, ENDOFTEXT, _bytes_to_unicode
from rgrg_tpu.text.report import (assemble_report, remove_duplicate_sentences,
                                  split_sentences)


class TestTokenizer:
    def test_roundtrip_bytes_dummy(self):
        tok = GPT2Tokenizer.dummy()
        for text in ["Hello, world!", "The heart is normal.",
                     "1.5 cm nodule  with  spaces", "naïve café ünïcode"]:
            ids = tok.encode(text)
            assert tok.decode(ids) == text

    def test_special_token_wrap_and_skip(self):
        tok = GPT2Tokenizer.dummy()
        ids = tok.encode("abc", add_special=True)
        assert ids[0] == tok.bos_token_id and ids[-1] == tok.eos_token_id
        assert tok.decode(ids) == "abc"
        assert ENDOFTEXT in tok.decode(ids, skip_special_tokens=False)

    def test_bpe_merges_applied(self):
        # tiny custom vocab with one merge: "l"+"l" -> "ll"
        byte_enc = _bytes_to_unicode()
        base = sorted(set(byte_enc.values()))
        encoder = {t: i for i, t in enumerate(base)}
        encoder["ll"] = len(encoder)
        encoder[ENDOFTEXT] = len(encoder)
        tok = GPT2Tokenizer(encoder, [("l", "l")])
        ids = tok.encode("hello")
        assert encoder["ll"] in ids
        assert tok.decode(ids) == "hello"

    def test_pad_batch(self):
        tok = GPT2Tokenizer.dummy()
        ids, mask = tok.pad_batch([[1, 2, 3], [4]], max_len=4)
        assert ids[0] == [1, 2, 3, tok.pad_token_id]
        assert mask[1] == [1, 0, 0, 0]

    def test_gpt2_regex_pretokenization(self):
        tok = GPT2Tokenizer.dummy()
        # contractions split like GPT-2
        ids = tok.encode("can't stop")
        assert tok.decode(ids) == "can't stop"

    def test_decode_cleanup_matches_hf(self, tmp_path):
        """decode(clean_up_tokenization_spaces=True) must be byte-identical
        to HF (reference decodes with it ON,
        generate_reports_for_images.py:118-119). Oracle: a real HF slow
        GPT2Tokenizer built from local vocab/merges files."""
        import json
        import transformers

        byte_enc = _bytes_to_unicode()
        encoder = {t: i for i, t in enumerate(sorted(set(byte_enc.values())))}
        encoder["ll"] = len(encoder)
        encoder[ENDOFTEXT] = len(encoder)
        vocab_file = tmp_path / "vocab.json"
        merges_file = tmp_path / "merges.txt"
        vocab_file.write_text(json.dumps(encoder), encoding="utf-8")
        merges_file.write_text("#version: 0.2\nl l\n", encoding="utf-8")

        hf = transformers.GPT2Tokenizer(str(vocab_file), str(merges_file))
        tok = GPT2Tokenizer(encoder, [("l", "l")])

        corpus = [
            "the heart is normal .",
            "we ca n't exclude effusion , or can we ?",
            "it 's stable ; she 've -- they 're here ! i 'm done .",
            "mid ' spaced ' quotes and a ' lone tick",
            "a . . repeated . dots .. and !? mixed",
            "tell me you will n't 've regressed",
            "hello fellow llamas",  # exercises the ll merge
            # '_' is NOT \p{L}/\p{N}: the punctuation alternative must eat
            # it (the old stdlib-re pattern dropped it entirely)
            "a_b under_score x __ y end",
            "a①b counts ½ too",  # non-Nd numerals split like HF
        ]
        rng = __import__("random").Random(0)
        alphabet = ("abc AB12 _'.,!?-/;:()\t " * 2)
        corpus += ["".join(rng.choice(alphabet) for _ in range(60))
                   for _ in range(25)]
        for text in corpus:
            ids = tok.encode(text)
            assert ids == hf.encode(text), text
            for cleanup in (True, False):
                got = tok.decode(ids, clean_up_tokenization_spaces=cleanup)
                want = hf.decode(ids, skip_special_tokens=True,
                                 clean_up_tokenization_spaces=cleanup)
                assert got == want, (text, cleanup, got, want)


class TestReportAssembly:
    def test_split_keeps_decimals(self):
        s = split_sentences("There is a 1.5 cm nodule. The heart is normal.")
        assert s == ["There is a 1.5 cm nodule.", "The heart is normal."]

    def test_split_divergence_corpus(self):
        """Pins the splitter's decisions on the constructs spacy's trf
        pipeline handles specially (VERDICT r2 #8). Each case documents the
        intended behavior on MIMIC-style phrasing."""
        cases = [
            # abbreviation traps: no split after Dr./e.g./i.e./et al./a.m.
            ("Discussed with Dr. Smith at the time of interpretation.",
             ["Discussed with Dr. Smith at the time of interpretation."]),
            ("Lines are unchanged, e.g. The right PICC remains.",
             ["Lines are unchanged, e.g. The right PICC remains."]),
            ("Findings discussed per Miura et al. No acute process.",
             ["Findings discussed per Miura et al. No acute process."]),
            ("Notified at 10:02 a.m. By telephone.",
             ["Notified at 10:02 a.m. By telephone."]),
            # single-letter initial
            ("Reviewed by A. Jones. The lungs are clear.",
             ["Reviewed by A. Jones.", "The lungs are clear."]),
            # single-letter medical terms DO end sentences: the initial
            # reading only wins when the next word isn't a sentence opener
            ("History of hepatitis B. The lungs are clear.",
             ["History of hepatitis B.", "The lungs are clear."]),
            ("Low vitamin D. No acute process.",
             ["Low vitamin D.", "No acute process."]),
            # numbered list: marker stays attached to its item
            ("1. No acute disease. 2. Stable cardiomegaly.",
             ["1. No acute disease.", "2. Stable cardiomegaly."]),
            # sentence not ending in '.': trailing fragment kept
            ("The heart is normal. No effusion",
             ["The heart is normal.", "No effusion"]),
            # lowercase continuation: no split (documented approximation)
            ("Heart size is normal. the lungs are clear.",
             ["Heart size is normal. the lungs are clear."]),
            # ! and ? terminators, parenthesized sentence start
            ("No pneumothorax! (Prior effusion resolved.) Heart normal.",
             ["No pneumothorax!", "(Prior effusion resolved.)",
              "Heart normal."]),
        ]
        for text, want in cases:
            assert split_sentences(text) == want, text

    def test_exact_dedup_order_preserving(self):
        out = remove_duplicate_sentences(["A b.", "C d.", "A b.", "E f."])
        assert out == ["A b.", "C d.", "E f."]

    def test_soft_dedup_removes_shorter(self):
        sents = ["The cardiomediastinal silhouette is normal today.",
                 "The cardiomediastinal silhouette is normal.",
                 "Lungs are clear."]

        def sim(pairs):
            return [0.95 if ("cardiomediastinal" in a and "cardiomediastinal" in b)
                    else 0.1 for a, b in pairs]

        out = remove_duplicate_sentences(sents, sim)
        assert out == ["The cardiomediastinal silhouette is normal today.",
                       "Lungs are clear."]

    def test_soft_dedup_tie_removes_first(self):
        sents = ["Aaaa bbbb.", "Cccc dddd."]  # equal length

        def sim(pairs):
            return [1.0]

        out = remove_duplicate_sentences(sents, sim)
        assert out == ["Cccc dddd."]  # reference removes s1 on ties

    def test_assemble(self):
        report = assemble_report(["The heart is normal.", "The heart is normal.",
                                  "Lungs are clear."])
        assert report == "The heart is normal. Lungs are clear."

    def test_removed_sentence_cannot_remove_others(self):
        # s0 removes s1; s1 (removed) must not remove s2 even if similar
        sents = ["Aaaaaaaaaa.", "Bbbb.", "Cc."]

        def sim(pairs):
            # (0,1) similar, (1,2) similar, (0,2) not
            table = {0: 0.95, 1: 0.05, 2: 0.95}
            return [table[i] for i in range(len(pairs))]

        out = remove_duplicate_sentences(sents, sim)
        assert out == ["Aaaaaaaaaa.", "Cc."]


class TestNativeBpe:
    """C++ encoder (native/bpe.cc) == Python path == HF oracle."""

    @pytest.fixture
    def vocab(self, tmp_path):
        import json
        byte_enc = _bytes_to_unicode()
        encoder = {t: i for i, t in enumerate(sorted(set(byte_enc.values())))}
        for m in ("he", "ar", "hear", "ll", "heart"):
            encoder[m] = len(encoder)
        encoder[ENDOFTEXT] = len(encoder)
        merges = [("h", "e"), ("a", "r"), ("he", "ar"), ("l", "l"),
                  ("hear", "t")]
        (tmp_path / "vocab.json").write_text(json.dumps(encoder),
                                             encoding="utf-8")
        (tmp_path / "merges.txt").write_text(
            "#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in merges)
            + "\n", encoding="utf-8")
        return encoder, merges, tmp_path

    def test_native_matches_python_and_hf(self, vocab):
        import random

        import transformers

        from rgrg_tpu.text.native_bpe import native_bpe_available
        if not native_bpe_available():
            pytest.skip("native/librgrg_host.so not built")
        encoder, merges, d = vocab
        tok = GPT2Tokenizer(encoder, merges)
        tok_py = GPT2Tokenizer(encoder, merges)
        tok_py._native_tried = True  # pin the Python path
        hf = transformers.GPT2Tokenizer(str(d / "vocab.json"),
                                        str(d / "merges.txt"))
        corpus = [
            "the heart is normal .",
            "heartfelt hello fellow llamas",
            "under_score a_b x __ y",
            "it's 'll 've n't mixed!?",
            "", " ", "   ", "a", "\t\n mixed \t ws\n",
        ]
        rng = random.Random(1)
        alpha = "heart l. _'!?,;()0123 \t" * 2
        corpus += ["".join(rng.choice(alpha) for _ in range(70))
                   for _ in range(40)]
        for s in corpus:
            a = tok.encode(s)
            assert a == tok_py.encode(s), s
            assert a == hf.encode(s), s

    def test_native_unicode_fallback(self, vocab):
        from rgrg_tpu.text.native_bpe import native_bpe_available
        if not native_bpe_available():
            pytest.skip("native/librgrg_host.so not built")
        encoder, merges, _ = vocab
        tok = GPT2Tokenizer(encoder, merges)
        tok_py = GPT2Tokenizer(encoder, merges)
        tok_py._native_tried = True
        for s in ("café ① röntgen", "naïve ½ dose"):
            assert tok.encode(s) == tok_py.encode(s), s
        assert tok._native is not None  # fallback didn't disable native
