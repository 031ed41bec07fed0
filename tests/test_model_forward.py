"""End-to-end model smoke test: init, train forward + criterion, eval forward,
all under jit with a small config and a synthetic batch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_feature_learning_tpu.config import load_config_train
from multimodal_feature_learning_tpu.models.criterion import SetCriterion, build_weight_dict
from multimodal_feature_learning_tpu.models.dvc import build_model

pytestmark = pytest.mark.slow  # heavy full-model/e2e (run with -m 'slow or not slow')

VOCAB = 60
PAD, BOS, EOS = 1, 2, 3


def small_cfg():
    cfg = load_config_train()
    cfg.dvc.d_model = 64
    cfg.dvc.num_queries = 6
    cfg.dvc.max_eseq_length = 10
    cfg.dvc.detr.feature_dim = 64
    cfg.dvc.detr.d_model = 64
    cfg.dvc.detr.num_heads = 2
    cfg.dvc.detr.enc_layers = 2
    cfg.dvc.detr.dec_layers = 2
    cfg.dvc.detr.transformer_ff_dim = 128
    cfg.dvc.detr.video_rescale_len = 24
    cfg.dvc.detr.num_feature_levels = 3
    cfg.dvc.caption.d_model = 64
    cfg.dvc.caption.depth = 2
    cfg.dvc.caption.num_heads = 2
    cfg.dataset.activity_net.video_rescale_len = 24
    cfg.dataset.activity_net.max_caption_len_all = 8
    cfg.dataset.activity_net.max_gt_target_segments = 4
    return cfg


def synthetic_batch(cfg, B=2, seed=0):
    rng = np.random.default_rng(seed)
    T = cfg.dataset.activity_net.video_rescale_len
    G = cfg.dataset.activity_net.max_gt_target_segments
    Lc = cfg.dataset.activity_net.max_caption_len_all
    Dv = cfg.dvc.detr.feature_dim

    video = rng.normal(size=(B, T, Dv)).astype(np.float32)
    video_mask = np.zeros((B, T), dtype=bool)
    video_mask[1, T - 5 :] = True  # second video padded
    durations = rng.uniform(10.0, 40.0, size=(B,)).astype(np.float32)

    n_gt = rng.integers(1, G + 1, size=(B,))
    gt_mask = np.arange(G)[None] < n_gt[:, None]
    centers = rng.uniform(0.2, 0.8, size=(B, G))
    lengths = rng.uniform(0.05, 0.3, size=(B, G))
    gt_segments = np.stack([centers, lengths], -1).astype(np.float32) * gt_mask[..., None]

    cap = np.full((B, G, Lc), PAD, dtype=np.int32)
    for b in range(B):
        for g in range(n_gt[b]):
            n_words = rng.integers(2, Lc - 2)
            cap[b, g, 0] = BOS
            cap[b, g, 1 : 1 + n_words] = rng.integers(4, VOCAB, size=n_words)
            cap[b, g, 1 + n_words] = EOS

    return {
        "video_tensor": jnp.asarray(video),
        "video_mask": jnp.asarray(video_mask),
        "durations": jnp.asarray(durations),
        "gt_segments": jnp.asarray(gt_segments),
        "gt_mask": jnp.asarray(gt_mask),
        "cap_tokens": jnp.asarray(cap),
    }


@pytest.fixture(scope="module")
def setup():
    cfg = small_cfg()
    model = build_model(cfg, VOCAB, PAD, BOS, EOS)
    batch = synthetic_batch(cfg)
    params = model.init(jax.random.PRNGKey(0), batch)
    return cfg, model, batch, params


def test_train_forward_and_criterion(setup):
    cfg, model, batch, params = setup
    weight_dict = build_weight_dict(cfg)
    criterion = SetCriterion(
        num_classes=cfg.dvc.num_classes,
        weight_dict=weight_dict,
        losses=["labels", "segments", "captions", "contexts", "mask_prediction"],
        pad_idx=PAD,
        smoothing=cfg.dvc.smoothing,
    )

    def loss_fn(params, batch, rng):
        out, indices, indices_aux, memory_mask = model.forward_train(params, batch, rng)
        losses = criterion(out, batch, indices, indices_aux, memory_mask)
        total = sum(
            losses[k] * weight_dict[k] for k in losses if k in weight_dict
        )
        return total, losses

    (total, losses), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True)
    )(params, batch, jax.random.PRNGKey(1))

    assert np.isfinite(np.asarray(total)), losses
    # all headline losses present
    for key in ("loss_counter", "loss_bbox", "loss_giou", "loss_caption",
                "loss_context", "loss_mask_prediction"):
        assert key in losses, sorted(losses)
        assert np.isfinite(np.asarray(losses[key])), (key, losses[key])
    # aux losses present for each decoder layer & caption layer & enc layer
    assert "loss_bbox_0" in losses
    assert "loss_caption_0" in losses
    assert "loss_bbox_enc_0" in losses
    # gradients flow and are finite
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    nonzero = sum(float(np.abs(np.asarray(g)).sum()) > 0 for g in leaves)
    assert nonzero > len(leaves) * 0.5


def test_eval_forward_greedy(setup):
    cfg, model, batch, params = setup
    out, captions, indices, indices_aux, memory_mask = jax.jit(
        lambda p, b: model.forward_eval(p, b, "one_by_one")
    )(params, batch)
    B = batch["video_tensor"].shape[0]
    G = cfg.dataset.activity_net.max_gt_target_segments
    Lc = cfg.dataset.activity_net.max_caption_len_all
    assert captions.shape == (B * G, Lc + 1)
    caps = np.asarray(captions)
    assert (caps[:, 0] == BOS).all()
    # every decoded caption terminates with eos somewhere
    assert ((caps == EOS).sum(1) >= 1).all()
    assert out["pred_segments"].shape == (B, cfg.dvc.num_queries, 2)


def test_eval_teacher_forcing(setup):
    cfg, model, batch, params = setup
    out, captions, *_ = model.forward_eval(params, batch, "teacher_forcing")
    Lc = cfg.dataset.activity_net.max_caption_len_all
    assert captions.shape == (batch["cap_tokens"].shape[0] * batch["cap_tokens"].shape[1], Lc - 1)


def test_eval_forward_beam_and_faster_eval(setup):
    """val_mode='beam' and faster_eval are reachable from the public eval API
    (reference exposes faster_eval at the model API, unimodal_sparse_dvc.py:111)."""
    cfg, model, batch, params = setup
    B = batch["video_tensor"].shape[0]
    G = cfg.dataset.activity_net.max_gt_target_segments
    Lc = cfg.dataset.activity_net.max_caption_len_all

    _, caps_beam, *_ = jax.jit(
        lambda p, b: model.forward_eval(p, b, "beam", beam_size=3)
    )(params, batch)
    assert caps_beam.shape == (B * G, Lc + 1)
    assert (np.asarray(caps_beam)[:, 0] == BOS).all()

    _, caps_fast, *_ = jax.jit(
        lambda p, b: model.forward_eval(p, b, "one_by_one", faster_eval=True)
    )(params, batch)
    caps_fast = np.asarray(caps_fast)
    assert caps_fast.shape == (B * G, Lc + 1)
    # faster_eval appends an unconditional <eos> column (reference :348-351)
    assert (caps_fast[:, -1] == EOS).all()
    # raw argmax: no frozen-after-eos <pad> fill requirement