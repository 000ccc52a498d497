"""NLG metric tests: hand-computed cases + nltk cross-checks."""

import math

import numpy as np
import pytest

from rgrg_tpu.eval import nlg


CANDS = ["the heart is normal .",
         "there is a small left pleural effusion .",
         "lungs are clear ."]
REFS = ["the heart size is normal .",
        "small left pleural effusion is present .",
        "the lungs are clear without consolidation ."]


def toks(texts):
    return [t.split() for t in texts]


class TestBleu:
    def test_perfect_match(self):
        c = toks(CANDS)
        r = [[x] for x in toks(CANDS)]
        b = nlg.corpus_bleu(c, r)
        for v in b:
            assert v == pytest.approx(1.0, abs=1e-6)

    def test_vs_nltk_corpus_bleu(self):
        from nltk.translate.bleu_score import corpus_bleu as nltk_bleu
        c = toks(CANDS)
        r = [[x] for x in toks(REFS)]
        got = nlg.corpus_bleu(c, r)
        for n in range(1, 5):
            weights = tuple(1.0 / n for _ in range(n))
            want = nltk_bleu(r, c, weights=weights)
            assert got[n - 1] == pytest.approx(want, abs=1e-6), f"bleu-{n}"

    def test_brevity_penalty(self):
        c = [["a", "b"]]
        r = [[["a", "b", "c", "d"]]]
        b = nlg.corpus_bleu(c, r)
        # p1 = 1, BP = exp(1 - 4/2)
        assert b[0] == pytest.approx(math.exp(-1.0), rel=1e-6)


class TestRouge:
    def test_hand_case(self):
        # cand "a b c d", ref "a c d e": lcs=3, p=r=3/4, beta=1.2
        got = nlg.rouge_l([["a", "b", "c", "d"]], [[["a", "c", "d", "e"]]])
        p = r = 0.75
        want = (1 + 1.44) * p * r / (r + 1.44 * p)
        assert got == pytest.approx(want, rel=1e-6)

    def test_perfect(self):
        assert nlg.rouge_l([["x", "y"]], [[["x", "y"]]]) == pytest.approx(1.0)


class TestCider:
    def test_identical_better_than_different(self):
        c_good = toks(CANDS)
        c_bad = toks(["completely unrelated words here .",
                      "nothing matches at all in this text .",
                      "random tokens everywhere ."])
        r = [[x] for x in toks(REFS)]
        df, logn = nlg.compute_doc_frequencies(r)
        good = nlg.cider_d(c_good, r, df, logn)
        bad = nlg.cider_d(c_bad, r, df, logn)
        assert good > bad >= 0.0

    def test_hand_case_unigram(self):
        # 2 docs; candidate 0 == ref 0 exactly
        r = [[["a", "b"]], [["c", "d"]]]
        c = [["a", "b"], ["c", "x"]]
        df, logn = nlg.compute_doc_frequencies(r)
        # idf of every ref unigram = log(2/1) = log 2
        got = nlg.cider_d(c, r, df, logn, max_n=1)
        w = math.log(2)
        # sample 0: identical vectors -> cosine 1, delta 0 -> 10.0
        s0 = 10.0
        # sample 1: cand vec {c: w, x: 0(df=0->log2/1? x unseen: df 0 -> max(...,1) -> idf=log2)}
        # overlap only "c": min(w, w)*w / (|c| * |r|); |cand| = sqrt(w^2 + w^2), |ref| = sqrt(2) w
        s1 = 10.0 * (w * w) / (math.sqrt(2) * w * math.sqrt(2) * w)
        want = (s0 + s1) / 2
        assert got == pytest.approx(want, rel=1e-6)

    def test_custom_df_changes_score(self):
        r = [[x] for x in toks(REFS)]
        c = toks(CANDS)
        base = nlg.cider_d(c, r)
        big_df, logn = nlg.compute_doc_frequencies(r)
        scaled = nlg.cider_d(c, r, big_df, logn + 2.0)  # pretend larger corpus
        assert scaled != pytest.approx(base)


class TestMeteor:
    def test_ordering(self):
        m = nlg.Meteor()
        perfect = m.score_pair("the heart is normal".split(),
                               "the heart is normal".split())
        partial = m.score_pair("the heart is enlarged".split(),
                               "the heart is normal".split())
        none = m.score_pair("xyz abc".split(), "the heart is normal".split())
        assert perfect > partial > none == 0.0

    def test_stem_matching(self):
        m = nlg.Meteor()
        with_stem = m.score_pair("lungs clear".split(), "lung clear".split())
        assert with_stem > 0.0
        # stem match weighted below exact
        exact = m.score_pair("lung clear".split(), "lung clear".split())
        assert exact > with_stem

    def test_chunk_penalty(self):
        m = nlg.Meteor()
        ordered = m.score_pair("a b c d".split(), "a b c d".split())
        shuffled = m.score_pair("d c b a".split(), "a b c d".split())
        assert ordered > shuffled


def test_compute_nlg_scores_api():
    scores = nlg.compute_nlg_scores(["bleu", "meteor", "rouge", "cider"],
                                    ["The heart is normal."] * 2 + ["Lungs clear."],
                                    ["The heart size is normal."] * 2 + ["Lungs are clear."])
    assert {"bleu_1", "bleu_2", "bleu_3", "bleu_4", "meteor", "rouge",
            "cider"} == set(scores)
    for v in scores.values():
        assert 0.0 <= v <= 10.0


class TestMeteorJar:
    def test_graceful_absence(self, monkeypatch):
        monkeypatch.delenv("RGRG_METEOR_JAR", raising=False)
        assert nlg.MeteorJar.maybe() is None
        monkeypatch.setenv("RGRG_METEOR_JAR", "/nonexistent/meteor.jar")
        assert nlg.MeteorJar.maybe() is None

    def test_stdio_protocol_against_emulator(self, tmp_path):
        """Drives _stat/corpus against a python emulator of meteor-1.5.jar's
        stdio protocol (SCORE -> stats, EVAL -> per-segment scores + final),
        verifying our pycocoevalcap-protocol implementation end to end."""
        import subprocess
        import sys

        fake = tmp_path / "fake_meteor.py"
        fake.write_text(
            "import sys\n"
            "for line in sys.stdin:\n"
            "    line = line.strip()\n"
            "    if line.startswith('SCORE'):\n"
            "        n = len(line.split(' ||| ')) - 1\n"
            "        print(' '.join(['1.0'] * n)); sys.stdout.flush()\n"
            "    elif line.startswith('EVAL'):\n"
            "        segs = line.split(' ||| ')[1:]\n"
            "        for _ in segs: print('0.5')\n"
            "        print(str(0.25 * len(segs))); sys.stdout.flush()\n")

        jar = nlg.MeteorJar.__new__(nlg.MeteorJar)
        jar.jar = str(fake)
        jar._proc = subprocess.Popen(
            [sys.executable, str(fake)], stdin=subprocess.PIPE,
            stdout=subprocess.PIPE, text=True, bufsize=1)
        cands = toks(["the lungs are clear .", "no effusion ."])
        refs = [toks(["lungs are clear ."]), toks(["no pleural effusion ."])]
        got = jar.corpus(cands, refs)
        assert got == 0.5  # 0.25 * 2 segments from the emulator
        jar.close()

    def test_as_text_strips_protocol_separators(self):
        assert nlg.MeteorJar._as_text(["a", "|||", "b"]) == "a  b".replace("  ", " ")
        assert nlg.MeteorJar._as_text("x ||| y") == "x  y".replace("  ", " ")

    @pytest.mark.skipif(nlg.MeteorJar.maybe() is None,
                        reason="no meteor jar + JVM in this environment")
    def test_real_jar_close_to_pure_python(self):
        cands = toks(["the lungs are clear .", "there is no pleural effusion ."])
        refs = [toks(["lungs are clear ."]), toks(["no pleural effusions ."])]
        jar = nlg.MeteorJar()
        j = jar.corpus(cands, refs)
        p = nlg.Meteor().corpus(cands, refs)
        assert abs(j - p) < 0.05
        jar.close()
