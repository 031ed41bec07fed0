import numpy as np
import pytest

from multimodal_feature_learning_tpu.evaluation.anet_eval import (
    ANETCaptionsEvaluator,
    segment_iou,
)
from multimodal_feature_learning_tpu.evaluation.metrics import Bleu, Cider, Meteor, Rouge
from multimodal_feature_learning_tpu.evaluation.metrics.meteor import porter_stem
from multimodal_feature_learning_tpu.evaluation.tokenizer import PTBTokenizer


def test_ptb_tokenizer():
    tok = PTBTokenizer()
    out = tok.tokenize({0: [{"caption": "A man, is Playing guitar."}]})
    assert out[0] == ["a man is playing guitar"]


def test_porter_stem_known_pairs():
    cases = {
        "caresses": "caress", "ponies": "poni", "ties": "ti", "caress": "caress",
        "cats": "cat", "feed": "feed", "agreed": "agre", "plastered": "plaster",
        "motoring": "motor", "sing": "sing", "conflated": "conflat",
        "happy": "happi", "relational": "relat", "conditional": "condit",
        "playing": "plai", "running": "run",  # original-1980 step 1c: y -> i
    }
    for word, stem in cases.items():
        assert porter_stem(word) == stem, (word, porter_stem(word), stem)


def test_bleu_perfect_and_disjoint():
    gts = {0: ["a man is playing guitar"], 1: ["the dog runs fast"]}
    res_perfect = {0: ["a man is playing guitar"], 1: ["the dog runs fast"]}
    scores, _ = Bleu(4).compute_score(gts, res_perfect)
    np.testing.assert_allclose(scores, 1.0, atol=1e-6)

    res_bad = {0: ["x y z w v"], 1: ["q r s t u"]}
    scores_bad, _ = Bleu(4).compute_score(gts, res_bad)
    assert all(s < 0.01 for s in scores_bad)


def test_bleu_partial_hand_computed():
    # hyp: "the cat sat" vs ref "the cat sat down":
    # p1 = 3/3, p2 = 2/2, p3 = 1/1; bp = exp(1 - 4/3)
    gts = {0: ["the cat sat down"]}
    res = {0: ["the cat sat"]}
    scores, _ = Bleu(3).compute_score(gts, res)
    bp = np.exp(1 - 4 / 3)
    np.testing.assert_allclose(scores[0], bp, rtol=1e-4)
    np.testing.assert_allclose(scores[1], bp, rtol=1e-4)
    np.testing.assert_allclose(scores[2], bp, rtol=1e-3)


def test_rouge_hand_computed():
    # hyp "a b c", ref "a b d": lcs=2, p=2/3, r=2/3 -> f = 2/3
    score, _ = Rouge().compute_score({0: ["a b d"]}, {0: ["a b c"]})
    np.testing.assert_allclose(score, 2 / 3, rtol=1e-6)


def test_cider_identical_is_ten():
    gts = {0: ["a man is playing a guitar on stage"],
           1: ["the dog catches the ball"]}
    score, scores = Cider().compute_score(gts, dict(gts))
    # identical captions: cosine similarity 1 for every n -> 10.0
    np.testing.assert_allclose(scores, 10.0, atol=1e-6)


def test_meteor_identical_and_stem():
    # METEOR 1.5 semantics: identical 4-word sentence, one function word "a".
    # P = R = 1 -> Fmean = 1; chunks=1, matches=4 -> frag=0.25,
    # Pen = 0.6 * 0.25^0.2 -> score = 1 - Pen = 0.54528503...
    score, _ = Meteor().compute_score({0: ["a man plays guitar"]}, {0: ["a man plays guitar"]})
    np.testing.assert_allclose(score, 1.0 - 0.6 * 0.25**0.2, rtol=1e-10)
    # stems align (weight 0.6): playing/plays share stem "play"; the stem
    # match scores strictly between no-match and exact-match
    s_exact, _ = Meteor().compute_score({0: ["the man is playing"]}, {0: ["the man is playing"]})
    s_stem, _ = Meteor().compute_score({0: ["the man is playing"]}, {0: ["the man is plays"]})
    s_miss, _ = Meteor().compute_score({0: ["the man is playing"]}, {0: ["the man is walking"]})
    assert s_miss < s_stem < s_exact


def test_meteor_order_sensitivity():
    from multimodal_feature_learning_tpu.evaluation.metrics.meteor import meteor_score

    ident = meteor_score("a man plays guitar", "a man plays guitar")
    scrambled = meteor_score("guitar plays man a", "a man plays guitar")
    assert scrambled < ident  # fragmentation penalty
    assert meteor_score("x y z", "q w e") == 0.0


def test_segment_iou():
    assert segment_iou([0, 10], [0, 10]) == pytest.approx(1.0, abs=1e-6)
    assert segment_iou([0, 10], [5, 15]) == pytest.approx(5 / 15, rel=1e-5)
    assert segment_iou([0, 1], [5, 6]) == 0.0


def make_gt():
    return {
        "v1": {
            "duration": 30.0,
            "timestamps": [[0.0, 10.0], [15.0, 25.0]],
            "sentences": ["a man is playing guitar", "the crowd cheers loudly"],
        },
        "v2": {
            "duration": 20.0,
            "timestamps": [[2.0, 12.0]],
            "sentences": ["a dog runs across the field"],
        },
    }


def submission(results):
    return {"version": "VERSION 1.0", "results": results, "external_data": {}}


def test_anet_eval_perfect_predictions():
    gt = make_gt()
    results = {
        vid: [
            {"sentence": s, "timestamp": ts}
            for s, ts in zip(g["sentences"], g["timestamps"])
        ]
        for vid, g in gt.items()
    }
    ev = ANETCaptionsEvaluator([gt], submission(results), tious=[0.3, 0.5, 0.7, 0.9])
    scores = ev.evaluate()
    for t in range(4):
        assert scores["Recall"][t] == pytest.approx(1.0)
        assert scores["Precision"][t] == pytest.approx(1.0)
    np.testing.assert_allclose(scores["Bleu_1"], 1.0, atol=1e-6)
    # v1 (2 caption pairs) scores 10; v2 (1 pair) scores 0 because per-video
    # CIDEr idf over a single ref document is log(1)=0 — the same degenerate
    # behavior as the reference pycocoevalcap pipeline. mean = 5.0.
    np.testing.assert_allclose(scores["CIDEr"], 5.0, atol=1e-6)


def test_anet_eval_wrong_timestamps():
    gt = make_gt()
    results = {
        vid: [{"sentence": g["sentences"][0], "timestamp": [g["duration"] - 0.5, g["duration"]]}]
        for vid, g in gt.items()
    }
    ev = ANETCaptionsEvaluator([gt], submission(results), tious=[0.9])
    scores = ev.evaluate()
    assert scores["Recall"][0] == 0.0
    assert scores["Precision"][0] == 0.0
    # captions compared to garbage strings -> ~0
    assert scores["Bleu_4"][0] < 0.05
