"""GT-free serving: UnimodalDVC.forward_serve + the micro-batching DVCServer.

The reference has no GT-free inference (its inference.py:112-121 Hungarian-
matches against annotations before captioning); this surface is new. The test
pins (a) the selection semantics (count-head k, stability ranking) and
(b) that the threaded micro-batching server returns exactly what a direct
forward_serve call on the same padded batch returns."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_feature_learning_tpu.config import load_config_train
from multimodal_feature_learning_tpu.data.vocab import Vocab
from multimodal_feature_learning_tpu.models.dvc import build_model

pytestmark = pytest.mark.slow

T_GRID = 24  # video_rescale_len at test dims


def tiny_cfg():
    cfg = load_config_train()
    cfg.batch_size = 4
    cfg.dvc.d_model = 64
    cfg.dvc.num_queries = 6
    cfg.dvc.detr.feature_dim = 32
    cfg.dvc.detr.d_model = 64
    cfg.dvc.detr.num_heads = 2
    cfg.dvc.detr.enc_layers = 2
    cfg.dvc.detr.dec_layers = 2
    cfg.dvc.detr.transformer_ff_dim = 128
    cfg.dvc.detr.video_rescale_len = T_GRID
    cfg.dvc.detr.num_feature_levels = 3
    cfg.dvc.caption.d_model = 64
    cfg.dvc.caption.depth = 2
    cfg.dvc.caption.num_heads = 2
    cfg.dataset.activity_net.video_rescale_len = T_GRID
    cfg.dataset.activity_net.max_caption_len_all = 8
    cfg.dataset.activity_net.max_gt_target_segments = 4
    return cfg


def tiny_vocab():
    itos = ["<unk>", "<pad>", "<bos>", "<eos>"] + [f"w{i}" for i in range(12)]
    return Vocab(itos)


@pytest.fixture(scope="module")
def world():
    cfg = tiny_cfg()
    vocab = tiny_vocab()
    model = build_model(cfg, len(vocab), vocab.pad_idx, vocab.bos_idx,
                        vocab.eos_idx)
    G, Lc = 4, 8
    init_batch = {
        "video_tensor": np.zeros((4, T_GRID, 32), np.float32),
        "video_mask": np.zeros((4, T_GRID), bool),
        "durations": np.ones((4,), np.float32),
        "gt_segments": np.zeros((4, G, 2), np.float32),
        "gt_mask": np.zeros((4, G), bool),
        "cap_tokens": np.full((4, G, Lc), vocab.pad_idx, np.int32),
    }
    params = model.init(jax.random.PRNGKey(0), init_batch)
    return cfg, vocab, model, params


def test_forward_serve_semantics(world):
    cfg, vocab, model, params = world
    rng = np.random.default_rng(0)
    B, G = 4, 4
    video = rng.normal(size=(B, T_GRID, 32)).astype(np.float32)
    mask = np.zeros((B, T_GRID), bool)
    durations = np.array([10.0, 25.0, 40.0, 60.0], np.float32)

    out = model.forward_serve(params, video, mask, durations)
    assert out["segments"].shape == (B, G, 2)
    assert out["captions"].shape[:2] == (B, G)
    assert out["k"].shape == (B,)
    assert bool(jnp.all((out["k"] >= 1) & (out["k"] <= G)))
    # valid marks exactly the first k rows
    k = np.asarray(out["k"])
    valid = np.asarray(out["valid"])
    for i in range(B):
        assert valid[i].sum() == k[i] and valid[i, : k[i]].all()
    # scores are the top-G in descending order
    scores = np.asarray(out["scores"])
    assert (np.diff(scores, axis=1) <= 1e-6).all()
    # captions start at BOS and are valid vocab ids
    caps = np.asarray(out["captions"])
    assert (caps[..., 0] == vocab.bos_idx).all()
    assert caps.min() >= 0 and caps.max() < len(vocab)


def test_server_matches_direct(world):
    cfg, vocab, model, params = world
    from serve import DVCServer

    rng = np.random.default_rng(1)
    server = DVCServer(model, params, vocab, cfg, batch_size=4,
                       max_wait_ms=2000.0)
    try:
        # raw variable-length requests (server rescales to the 24 grid)
        reqs = [
            (rng.normal(size=(t, 32)).astype(np.float32), d)
            for t, d in [(17, 12.0), (24, 33.0), (55, 48.0), (8, 7.5)]
        ]
        # occupy the worker with a warmup request so the 4 real requests
        # queue up and dispatch as ONE batch
        warm = server.submit(reqs[0][0], reqs[0][1])
        futs = [server.submit(f, d) for f, d in reqs]
        warm.result(timeout=120)
        results = [f.result(timeout=120) for f in futs]
    finally:
        server.close()

    # direct call on the identical padded batch
    from multimodal_feature_learning_tpu.data.anet import nearest_resize

    video = np.stack([nearest_resize(f[None], T_GRID, axis=1)[0]
                      for f, _ in reqs])
    durations = np.array([d for _, d in reqs], np.float32)
    direct = model.forward_serve(
        params, video, np.zeros((4, T_GRID), bool), durations
    )
    k = np.asarray(direct["k"])
    seg = np.asarray(direct["segments"])
    from multimodal_feature_learning_tpu.utils.postprocess import (
        captions_to_string,
    )

    for i, events in enumerate(results):
        assert len(events) == k[i]
        want = captions_to_string(
            np.asarray(direct["captions"])[i, : k[i]], vocab
        )
        for j, ev in enumerate(events):
            np.testing.assert_allclose(ev["segment"], seg[i, j], rtol=1e-5,
                                       atol=1e-5)
            assert ev["caption"] == want[j]


def test_backpressure_sheds_beyond_max_queue(world):
    cfg, vocab, model, params = world
    import threading
    import time as _time

    from serve import DVCServer

    rng = np.random.default_rng(3)
    server = DVCServer(model, params, vocab, cfg, batch_size=1,
                       max_wait_ms=1.0, max_queue=2)
    gate = threading.Event()
    orig = server._dispatch_safe
    server._dispatch_safe = lambda batch: (gate.wait(), orig(batch))
    try:
        feats = rng.normal(size=(16, 32)).astype(np.float32)
        first = server.submit(feats, 5.0)
        # wait until the worker has taken it (queue empty, worker blocked)
        deadline = _time.monotonic() + 30
        while server._q.qsize() > 0 and _time.monotonic() < deadline:
            _time.sleep(0.01)
        queued = [server.submit(feats, 5.0) for _ in range(2)]  # fills bound
        with pytest.raises(RuntimeError, match="overloaded"):
            server.submit(feats, 5.0)
        assert server.stats.get("shed", 0) == 1
        gate.set()
        for f in [first] + queued:  # shed request never entered the queue
            assert len(f.result(timeout=120)) >= 1
    finally:
        gate.set()
        server.close()


def test_dispatch_error_fails_future_not_server(world):
    cfg, vocab, model, params = world
    from serve import DVCServer

    rng = np.random.default_rng(2)
    server = DVCServer(model, params, vocab, cfg, batch_size=4, max_wait_ms=5.0)
    try:
        # malformed shape is rejected synchronously at submit (before it can
        # poison a batch)
        with pytest.raises(ValueError):
            server.submit(rng.normal(size=(10, 7)).astype(np.float32), 5.0)

        # an ingest failure fails ONLY its own future — co-batched requests
        # still get results and the worker thread survives
        real_ingest = server._ingest

        def poisoned(feats):
            if feats.shape[0] == 13:
                raise RuntimeError("poisoned request")
            return real_ingest(feats)

        server._ingest = poisoned
        bad = server.submit(rng.normal(size=(13, 32)).astype(np.float32), 5.0)
        good = server.submit(rng.normal(size=(16, 32)).astype(np.float32), 9.0)
        with pytest.raises(RuntimeError):
            bad.result(timeout=120)
        events = good.result(timeout=120)
        assert len(events) >= 1 and all("caption" in e for e in events)
        assert server.stats.get("errors", 0) == 1
    finally:
        server.close()


def test_transfer_bf16_matches_direct_on_cast_features(world):
    """cfg.transfer_dtype="bfloat16" ships features bf16 and upcasts on
    device; the result must equal a direct forward_serve on the SAME
    bf16-rounded features (the cast is the only semantic change)."""
    cfg, vocab, model, params = world
    import copy

    from serve import DVCServer

    cfg16 = copy.deepcopy(cfg)
    cfg16.transfer_dtype = "bfloat16"
    rng = np.random.default_rng(3)
    server = DVCServer(model, params, vocab, cfg16, batch_size=2,
                       max_wait_ms=500.0)
    try:
        feats = rng.normal(size=(T_GRID, 32)).astype(np.float32)
        events = server.submit(feats, 20.0).result(timeout=120)
    finally:
        server.close()

    cast = np.asarray(feats.astype(jnp.bfloat16).astype(np.float32))
    video = np.stack([cast, np.zeros_like(cast)])
    direct = model.forward_serve(
        params, video, np.zeros((2, T_GRID), bool),
        np.array([20.0, 1.0], np.float32),
    )
    k = int(np.asarray(direct["k"])[0])
    assert len(events) == k
    from multimodal_feature_learning_tpu.utils.postprocess import (
        captions_to_string,
    )

    want = captions_to_string(np.asarray(direct["captions"])[0, :k], vocab)
    for j, ev in enumerate(events):
        np.testing.assert_allclose(
            ev["segment"], np.asarray(direct["segments"])[0, j],
            rtol=1e-5, atol=1e-5)
        assert ev["caption"] == want[j]
