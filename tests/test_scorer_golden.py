"""Golden tests pinning the caption scorers to exact pycocoevalcap semantics.

pycocoevalcap is not installed and the reference's submodule is empty, so the
goldens below are hand-derived by executing the published pycocoevalcap
algorithms on paper (bleu_scorer.py compute_score(option='closest'),
rouge.py beta=1.2, cider_scorer.py n=4 sigma=6). Each case is small enough
that the expected value is a closed-form number.
"""

import math

import numpy as np

from multimodal_feature_learning_tpu.evaluation.metrics import Bleu, Cider, Rouge

SMALL = 1e-9
TINY = 1e-15


class TestBleuGolden:
    def test_perfect_match_is_one(self):
        gts = {1: ["the cat sat on the mat"], 2: ["a dog runs fast", "the dog runs"]}
        res = {1: ["the cat sat on the mat"], 2: ["a dog runs"]}
        # key 2: closest reflen to testlen 3 is 3 ("the dog runs"); all 1-3
        # grams of "a dog runs" appear in "a dog runs fast" -> clipped
        # precisions 1. Corpus testlen=9, reflen=9 -> ratio just below 1 due to
        # COCO epsilons, BP ~ 1.
        bleus, per_sentence = Bleu(4).compute_score(gts, res)
        assert np.allclose(bleus[:3], 1.0, atol=1e-8)
        # 4-gram: guess = 3 (key1) + 0 (key2), correct = 3 -> ~1
        assert np.allclose(bleus[3], 1.0, atol=1e-8)
        assert len(per_sentence[0]) == 2  # per-sentence lists

    def test_clipping_and_cumulative_product(self):
        # hyp "the the the cat" vs ref "the cat":
        # correct=[2,1,0,0], guess=[4,3,2,1]; testlen 4 > reflen 2 -> BP=1
        gts = {0: ["the cat"]}
        res = {0: ["the the the cat"]}
        bleus, _ = Bleu(4).compute_score(gts, res)
        b1 = (2 + TINY) / (4 + SMALL)
        b2 = (b1 * (1 + TINY) / (3 + SMALL)) ** 0.5
        b3 = (b1 * (1 + TINY) / (3 + SMALL) * (0 + TINY) / (2 + SMALL)) ** (1 / 3)
        np.testing.assert_allclose(bleus[0], b1, rtol=1e-12)
        np.testing.assert_allclose(bleus[1], b2, rtol=1e-12)
        np.testing.assert_allclose(bleus[2], b3, rtol=1e-12)
        assert bleus[3] < 1e-6  # epsilon-smoothed zero

    def test_brevity_penalty_closest(self):
        # hyp len 2, refs lens [3, 4]: closest reflen = 3
        # unigram/bigram precisions 1 -> bleus = exp(1 - 3/2) = exp(-0.5)
        gts = {0: ["the cat sat", "the cat sat down"]}
        res = {0: ["the cat"]}
        bleus, _ = Bleu(4).compute_score(gts, res)
        np.testing.assert_allclose(bleus[0], math.exp(-0.5), rtol=1e-8)
        np.testing.assert_allclose(bleus[1], math.exp(-0.5), rtol=1e-8)

    def test_closest_tie_prefers_shorter(self):
        # testlen 3, ref lens [2, 4]: both |diff|=1, pycocoevalcap tie-break
        # min(reflens, key=(abs diff, reflen)) -> 2 -> ratio>1 -> no BP
        gts = {0: ["aa bb", "aa bb cc dd"]}
        res = {0: ["aa bb cc"]}
        bleus, _ = Bleu(4).compute_score(gts, res)
        np.testing.assert_allclose(bleus[0], 1.0, atol=1e-8)


class TestRougeGolden:
    def test_hand_computed_f(self):
        # hyp "the cat sat": LCS vs "the cat on mat" = 2 (p=2/3, r=1/2);
        # LCS vs "a sat cat" = 1 (p=1/3, r=1/3). max p=2/3, max r=1/2.
        # F = (1+1.44)*p*r / (r + 1.44*p) = 0.5570776255707762
        gts = {0: ["the cat on mat", "a sat cat"]}
        res = {0: ["the cat sat"]}
        score, _ = Rouge().compute_score(gts, res)
        p, r = 2 / 3, 1 / 2
        expected = (1 + 1.2**2) * p * r / (r + 1.2**2 * p)
        np.testing.assert_allclose(score, expected, rtol=1e-12)

    def test_identical_is_one(self):
        score, _ = Rouge().compute_score({0: ["a b c d"]}, {0: ["a b c d"]})
        np.testing.assert_allclose(score, 1.0, rtol=1e-12)

    def test_no_overlap_is_zero(self):
        score, _ = Rouge().compute_score({0: ["x y z"]}, {0: ["a b c"]})
        assert score == 0.0


class TestCiderGolden:
    def test_disjoint_perfect_matches(self):
        # Two docs with disjoint vocab; every ngram has df=1 -> idf=log(2).
        # Identical hyp/ref "a b": unigram+bigram cosines = 1, tri/4-gram
        # norms 0 -> 0. mean([1,1,0,0]) * 10 = 5.0 for both keys.
        gts = {1: ["a b"], 2: ["c d"]}
        res = {1: ["a b"], 2: ["c d"]}
        score, scores = Cider().compute_score(gts, res)
        np.testing.assert_allclose(scores, [5.0, 5.0], rtol=1e-12)
        np.testing.assert_allclose(score, 5.0, rtol=1e-12)

    def test_df_discounts_shared_ngrams(self):
        # 'a' appears in both ref docs -> df=2 -> idf=0 -> contributes nothing.
        # key 1 identical ("a b"): sim over b-unigram and (a,b)-bigram = 1 each
        # -> 5.0. key 2 hyp "a b" vs ref "a c": no overlapping weighted ngram
        # -> 0. mean = 2.5.
        gts = {1: ["a b"], 2: ["a c"]}
        res = {1: ["a b"], 2: ["a b"]}
        score, scores = Cider().compute_score(gts, res)
        np.testing.assert_allclose(scores, [5.0, 0.0], atol=1e-12)
        np.testing.assert_allclose(score, 2.5, atol=1e-12)

    def test_length_penalty(self):
        # Same ngram content, different lengths: delta = |len(hyp)-len(ref)|
        # multiplies e^(-delta^2/(2*36)).
        gts = {1: ["a b"], 2: ["c d e f g h"]}
        res = {1: ["a b a b"], 2: ["c d e f g h"]}
        score, scores = Cider().compute_score(gts, res)
        # key 1: hyp "a b a b" vs ref "a b", all dfs 1 (docs disjoint)
        w = math.log(2.0)
        # hyp unigrams a:2,b:2 -> vec 2w each, norm = sqrt(8)w
        # ref unigrams a:1,b:1 -> vec w each, norm = sqrt(2)w
        # sim1 = (min(2w,w)*w)*2 / (sqrt(8)w*sqrt(2)w) = 2w^2/(4w^2) = 0.5
        # hyp bigrams (a,b):2,(b,a):1 -> vec 2w,w norm=sqrt(5)w; ref (a,b):w
        # sim2 = min(2w,w)*w/(sqrt(5)w*w) = 1/sqrt(5)
        # tri/4-grams of hyp not in ref -> 0
        delta_pen = math.exp(-(4 - 2) ** 2 / (2 * 36.0))
        expected1 = np.mean([0.5 * delta_pen, (1 / math.sqrt(5)) * delta_pen, 0, 0]) * 10
        np.testing.assert_allclose(scores[0], expected1, rtol=1e-12)
        # key 2 identical 6-gram sentence: 1..4-gram cosines all 1 -> 10.0
        np.testing.assert_allclose(scores[1], 10.0, rtol=1e-12)
