"""The reusable reference bridge (utils/ref_bridge.py) reproduces the
full-model parity of tests/test_full_model_parity.py, including the flagship
use_enc_aux_loss=True configuration that the fixed-dims test leaves off."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from multimodal_feature_learning_tpu.config import load_config_train
from multimodal_feature_learning_tpu.models.dvc import build_model
from multimodal_feature_learning_tpu.utils.ref_bridge import (
    build_reference_model,
    load_into_reference,
    transplant,
)

B, T, DM, G, LC, VOCAB = 2, 24, 64, 3, 8, 40
PAD, BOS, EOS = 1, 2, 3


class VocabStub(dict):
    def __init__(self):
        super().__init__({"<unk>": 0, "<pad>": PAD, "<bos>": BOS, "<eos>": EOS})

    def __len__(self):
        return VOCAB


def small_cfg():
    cfg = load_config_train()
    cfg.use_differentiable_mask = False
    cfg.msda_backend = "gather"
    cfg.dvc.d_model = DM
    cfg.dvc.num_queries = 6
    cfg.dvc.detr.feature_dim = DM
    cfg.dvc.detr.d_model = DM
    cfg.dvc.detr.num_heads = 2
    cfg.dvc.detr.enc_layers = 2
    cfg.dvc.detr.dec_layers = 2
    cfg.dvc.detr.transformer_ff_dim = 128
    cfg.dvc.detr.video_rescale_len = T
    cfg.dvc.detr.num_feature_levels = 3
    cfg.dvc.detr.use_enc_aux_loss = True  # flagship setting
    cfg.dvc.caption.d_model = DM
    cfg.dvc.caption.depth = 2
    cfg.dvc.caption.num_heads = 2
    cfg.dataset.activity_net.video_rescale_len = T
    cfg.dataset.activity_net.max_caption_len_all = LC
    cfg.dataset.activity_net.max_gt_target_segments = G
    return cfg


@pytest.mark.slow
def test_bridge_greedy_parity():
    cfg = small_cfg()
    model = build_model(cfg, VOCAB, PAD, BOS, EOS)

    rng = np.random.default_rng(0)
    video = rng.normal(size=(B, T, DM)).astype(np.float32)
    mask = np.zeros((B, T), dtype=bool)
    mask[1, T - 5:] = True
    durations = np.array([40.0, 22.0], dtype=np.float32)
    centers = rng.uniform(0.25, 0.75, size=(B, G)).astype(np.float32)
    lengths = rng.uniform(0.1, 0.3, size=(B, G)).astype(np.float32)
    gt = np.stack([centers, lengths], -1).astype(np.float32)
    cap = np.full((B, G, LC), PAD, dtype=np.int32)
    for b in range(B):
        for g in range(G):
            n = int(rng.integers(2, LC - 2))
            cap[b, g, 0] = BOS
            cap[b, g, 1: 1 + n] = rng.integers(4, VOCAB, size=n)
            cap[b, g, 1 + n] = EOS

    batch = {
        "video_tensor": jnp.asarray(video),
        "video_mask": jnp.asarray(mask),
        "durations": jnp.asarray(durations),
        "gt_segments": jnp.asarray(gt),
        "gt_mask": jnp.ones((B, G), dtype=bool),
        "cap_tokens": jnp.asarray(cap),
    }
    params = model.init(jax.random.PRNGKey(0), batch)
    # randomize zero-init segment head so LSAP optimum is unique (see
    # test_full_model_parity.py)
    seg_last = params["proposal"]["params"]["segment_embedding_decoder"]["layers_2"]
    key = jax.random.PRNGKey(42)
    seg_last["kernel"] = 0.1 * jax.random.normal(key, seg_last["kernel"].shape)
    seg_last["bias"] = 0.05 * jax.random.normal(key, seg_last["bias"].shape)

    ref = build_reference_model(cfg, VocabStub())
    load_into_reference(ref, transplant(jax.device_get(params), cfg))

    obj = {
        "video_tensor": torch.from_numpy(video),
        "video_mask": torch.from_numpy(mask),
        "video_length": torch.tensor(
            [[T, durations[0], G], [T, durations[1], G]], dtype=torch.float32
        ),
        "video_target": [
            {"segments": torch.from_numpy(gt[b]), "labels": torch.zeros(G).long(),
             "masks": None, "vid_id": f"v{b}"}
            for b in range(B)
        ],
        "cap_tensor": torch.from_numpy(cap.reshape(B * G, LC)).long(),
        "cap_mask": torch.from_numpy(cap.reshape(B * G, LC) == PAD),
    }

    with torch.no_grad():
        ref_out, ref_caps, *_ = ref(obj, is_training=False, faster_eval=False,
                                    val_mode="one_by_one")
    out, caps, indices, *_ = model.forward_eval(params, batch, "one_by_one")

    np.testing.assert_allclose(
        np.asarray(out["pred_segments"]), ref_out["pred_segments"].numpy(),
        rtol=1e-3, atol=1e-4,
    )
    np.testing.assert_array_equal(np.asarray(caps), ref_caps.numpy())
