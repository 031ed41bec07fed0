"""Continuous-batching server equivalence (VERDICT r3 item 5).

The slot-refill server (serve.py ContinuousDVCServer: prefill / per-slot
chunked decode / where-merge refill) must return EXACTLY what a direct
forward_serve call returns for every request — per-video greedy decode is
batch-independent, so joining a half-decoded pool mid-flight may not change a
single token. Exercised with more requests than slots so harvest+refill
actually happens, and with stress on per-slot cursors by making slot count
tiny (2) relative to the request count (6).
"""

import jax
import numpy as np
import pytest

from tests.test_serve import T_GRID, tiny_cfg, tiny_vocab, world  # noqa: F401
from multimodal_feature_learning_tpu.data.anet import nearest_resize
from multimodal_feature_learning_tpu.utils.postprocess import captions_to_string

pytestmark = pytest.mark.slow


def _direct(model, params, reqs):
    video = np.stack([nearest_resize(f[None], T_GRID, axis=1)[0]
                      for f, _ in reqs])
    durations = np.array([d for _, d in reqs], np.float32)
    B = len(reqs)
    return model.forward_serve(
        params, video, np.zeros((B, T_GRID), bool), durations)


def _check(results, direct, vocab):
    k = np.asarray(direct["k"])
    seg = np.asarray(direct["segments"])
    caps = np.asarray(direct["captions"])
    scores = np.asarray(direct["scores"])
    for i, events in enumerate(results):
        assert len(events) == k[i]
        want = captions_to_string(caps[i, : k[i]], vocab)
        for j, ev in enumerate(events):
            assert ev["caption"] == want[j], (i, j, ev["caption"], want[j])
            np.testing.assert_allclose(ev["segment"], seg[i, j],
                                       rtol=1e-5, atol=1e-5)
            np.testing.assert_allclose(ev["score"], scores[i, j],
                                       rtol=1e-5, atol=1e-5)


def test_continuous_matches_direct(world):  # noqa: F811
    cfg, vocab, model, params = world
    from serve import ContinuousDVCServer

    rng = np.random.default_rng(2)
    reqs = [
        (rng.normal(size=(t, 32)).astype(np.float32), d)
        for t, d in [(17, 12.0), (24, 33.0), (55, 48.0), (8, 7.5),
                     (30, 20.0), (12, 90.0)]
    ]
    # 2 slots, 6 requests: every slot is harvested and refilled at least once,
    # and refills join while the other slot is mid-caption (per-slot cursors)
    server = ContinuousDVCServer(model, params, vocab, cfg,
                                 batch_size=2, chunk=3)
    try:
        futs = [server.submit(f, d) for f, d in reqs]
        results = [f.result(timeout=300) for f in futs]
    finally:
        server.close()
    assert server.stats["chunks"] > 2
    assert server.stats["prefills"] >= 3

    direct = _direct(model, params, reqs)
    _check(results, direct, vocab)


def test_continuous_single_request(world):  # noqa: F811
    """One request through an otherwise idle pool (inactive slots must not
    perturb the active one)."""
    cfg, vocab, model, params = world
    from serve import ContinuousDVCServer

    rng = np.random.default_rng(3)
    req = (rng.normal(size=(40, 32)).astype(np.float32), 27.0)
    server = ContinuousDVCServer(model, params, vocab, cfg,
                                 batch_size=4, chunk=2)
    try:
        events = server.submit(*req).result(timeout=300)
    finally:
        server.close()
    direct = _direct(model, params, [req] * 4)
    _check([events], direct, vocab)


def test_failed_admit_spares_active_slots(world):  # noqa: F811
    """A failed admit dispatch (prefill/merge raising) must fail ONLY that
    wave's requests — the merge is non-donated, so in-flight slots keep their
    progress and still resolve correctly (ADVICE r4: blast radius)."""
    import time as _time

    from serve import ContinuousDVCServer

    cfg, vocab, model, params = world
    rng = np.random.default_rng(7)
    server = ContinuousDVCServer(model, params, vocab, cfg,
                                 batch_size=2, chunk=2)
    try:
        req_a = rng.normal(size=(T_GRID, 32)).astype(np.float32)
        fut_a = server.submit(req_a, 21.0)
        deadline = _time.monotonic() + 60
        while server.stats["prefills"] < 1:  # A's admit wave has dispatched
            assert _time.monotonic() < deadline, "request A never admitted"
            _time.sleep(0.005)

        # poison exactly one merge dispatch
        real_merge = server._merge_fn
        calls = {"n": 0}

        def bad_merge(*a, **kw):
            calls["n"] += 1
            if calls["n"] == 1:
                raise RuntimeError("injected admit failure")
            return real_merge(*a, **kw)

        server._merge_fn = bad_merge
        req_b = rng.normal(size=(T_GRID, 32)).astype(np.float32)
        fut_b = server.submit(req_b, 9.0)

        with pytest.raises(RuntimeError, match="injected admit failure"):
            fut_b.result(timeout=120)
        events_a = fut_a.result(timeout=120)  # A survives the failed admit

        # A's result is still exactly the direct forward_serve answer
        direct = _direct(model, params, [(req_a, 21.0), (req_a, 21.0)])
        _check([events_a], direct, vocab)

        # and the pool is healthy: a later request succeeds
        server._merge_fn = real_merge
        fut_c = server.submit(req_b, 9.0)
        assert len(fut_c.result(timeout=120)) >= 1
    finally:
        server.close()
