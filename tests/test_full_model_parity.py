"""FULL-MODEL parity: our jitted UnimodalSparseDVC vs the actual reference
PyTorch model (imported from /root/reference, run on CPU) with identical
weights transplanted from the flax params.

This is the strongest end-to-end oracle available: same inputs, same weights,
teacher-forcing eval — pred_segments / pred_count / saliency / caption
probabilities and the argmaxed caption tokens must agree within float
tolerance. (The reference is imported for *execution as an oracle* only.)
"""

import sys
from unittest import mock

import numpy as np
import pytest
import torch

# -- make the reference importable (stub modules absent from this image) -------
_tv = mock.MagicMock()
_tv.__version__ = "0.15.0"
sys.modules.setdefault("torchvision", _tv)
sys.modules["torchvision"] = _tv
for name in ("torchaudio", "torchaudio.compliance", "torchaudio.compliance.kaldi",
             "wandb", "timm"):
    sys.modules.setdefault(name, mock.MagicMock())
if "/root/reference" not in sys.path:
    sys.path.insert(0, "/root/reference")

import ml_collections  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from multimodal_feature_learning_tpu.config import load_config_train  # noqa: E402
from multimodal_feature_learning_tpu.models.dvc import build_model  # noqa: E402

pytestmark = pytest.mark.slow  # heavy full-model/e2e (run with -m 'slow or not slow')

# dims: tiny but structurally faithful (3 levels, 2+2 layers, sparse rho=0.5)
B, T, DM, LVL, HEADS, ENC, DEC, CAPD, Q, G, LC, VOCAB = (
    2, 24, 64, 3, 2, 2, 2, 2, 6, 3, 8, 40
)
PAD, BOS, EOS = 1, 2, 3


class VocabStub(dict):
    def __init__(self):
        super().__init__({"<unk>": 0, "<pad>": PAD, "<bos>": BOS, "<eos>": EOS})

    def __len__(self):
        return VOCAB


def our_cfg():
    cfg = load_config_train()
    cfg.use_differentiable_mask = False
    cfg.dvc.losses = ["labels", "segments", "captions", "mask_prediction"]
    cfg.dvc.d_model = DM
    cfg.dvc.num_queries = Q
    cfg.dvc.detr.feature_dim = DM
    cfg.dvc.detr.d_model = DM
    cfg.dvc.detr.num_heads = HEADS
    cfg.dvc.detr.enc_layers = ENC
    cfg.dvc.detr.dec_layers = DEC
    cfg.dvc.detr.transformer_ff_dim = 128
    cfg.dvc.detr.video_rescale_len = T
    cfg.dvc.detr.num_feature_levels = LVL
    cfg.dvc.detr.use_enc_aux_loss = False
    cfg.dvc.caption.d_model = DM
    cfg.dvc.caption.depth = CAPD
    cfg.dvc.caption.num_heads = HEADS
    cfg.dataset.activity_net.video_rescale_len = T
    cfg.dataset.activity_net.max_caption_len_all = LC
    cfg.dataset.activity_net.max_gt_target_segments = G
    return cfg


def build_reference_model():
    from models.matcher import HungarianMatcher
    from models.sparse.unimodal_sparse_dvc import UnimodalSparseDVC

    sd = ml_collections.ConfigDict()
    sd.feature_dim = DM
    sd.d_model = DM
    sd.num_heads = HEADS
    sd.num_feature_levels = LVL
    sd.dec_n_points = 4
    sd.enc_n_points = 4
    sd.enc_layers = ENC
    sd.dec_layers = DEC
    sd.transformer_dropout_prob = 0.0
    sd.transformer_ff_dim = 128
    sd.video_rescale_len = T
    sd.rho = 0.5
    sd.use_enc_aux_loss = False
    sd.return_intermediate = True
    sd.eff_query_init = False
    sd.eff_specific_head = False

    cap = ml_collections.ConfigDict()
    cap.d_model = DM
    cap.depth = CAPD
    cap.num_heads = HEADS
    cap.mlp_ratio = 4
    cap.qkv_bias = True
    cap.positional_embedding_dropout = 0.0
    cap.attention_dropout = 0.0
    cap.projection_dropout = 0.0
    cap.bridge_dropout = 0.0
    cap.mlp_dropout_1 = 0.0
    cap.mlp_dropout_2 = 0.0
    cap.pre_norm = False
    cap.model_official = None
    cap.weight_init = False
    cap.weight_load = False
    cap.emb_weights_req_grad = True
    cap.return_intermediate = True

    matcher = HungarianMatcher(1.0, 5.0, 2.0, 0.25, 2.0)
    model = UnimodalSparseDVC(
        input_modalities=["video"], num_queries=Q, d_model=DM, num_classes=200,
        aux_loss=True, matcher=matcher, threshold=0.5, max_eseq_length=10,
        vocab=VocabStub(), seq_len=LC, embedding_matrix=None,
        sparse_detr_args=sd, caption_args=cap, use_differentiable_mask=False,
    )
    model.eval()
    return model


# -- weight transplant: flax params -> torch state_dict -------------------------

def _t(a):
    return torch.from_numpy(np.array(a))


def dense(sd, torch_name, p):
    sd[f"{torch_name}.weight"] = _t(p["kernel"]).T.contiguous()
    if "bias" in p:
        sd[f"{torch_name}.bias"] = _t(p["bias"])


def ln(sd, torch_name, p):
    sd[f"{torch_name}.weight"] = _t(p["scale"])
    sd[f"{torch_name}.bias"] = _t(p["bias"])


def cross_attention(sd, torch_name, p):
    dense(sd, f"{torch_name}.q_linear", p["q_linear"])
    dense(sd, f"{torch_name}.k_linear", p["k_linear"])
    dense(sd, f"{torch_name}.v_linear", p["v_linear"])
    dense(sd, f"{torch_name}.projection_layer", p["projection_layer"])


def msda(sd, torch_name, p):
    for sub in ("sampling_offsets", "attention_weights", "value_proj", "output_proj"):
        dense(sd, f"{torch_name}.{sub}", p[sub])


def mha(sd, torch_name, p):
    wq = _t(p["q_linear"]["kernel"]).T
    wk = _t(p["k_linear"]["kernel"]).T
    wv = _t(p["v_linear"]["kernel"]).T
    sd[f"{torch_name}.in_proj_weight"] = torch.cat([wq, wk, wv]).contiguous()
    sd[f"{torch_name}.in_proj_bias"] = torch.cat(
        [_t(p["q_linear"]["bias"]), _t(p["k_linear"]["bias"]), _t(p["v_linear"]["bias"])]
    )
    dense(sd, f"{torch_name}.out_proj", p["projection_layer"])


def transplant(params) -> dict:
    sd = {}
    pp = params["proposal"]["params"]
    sd["query_embedding.weight"] = _t(pp["query_embedding"])
    for enc_dec, pname in (("encoder", "segment_embedding_encoder"),
                           ("decoder", "segment_embedding_decoder")):
        if pname in pp:  # encoder heads exist only with use_enc_aux_loss
            for i in range(3):
                dense(sd, f"segment_embedding_{enc_dec}.layers.{i}", pp[pname][f"layers_{i}"])
    if "count_head_encoder" in pp:
        dense(sd, "count_head_encoder", pp["count_head_encoder"])
    dense(sd, "count_head_decoder", pp["count_head_decoder"])

    be = pp["base_encoder"]
    dense(sd, "pos_embed.duration_embed_layer", be["pos_embed"]["duration_embed_layer"])
    for l in range(LVL):
        k = _t(be[f"input_proj_{l}"]["kernel"])  # (k, in, out)
        sd[f"base_encoder.input_proj.{l}.0.weight"] = k.permute(2, 1, 0).contiguous()
        sd[f"base_encoder.input_proj.{l}.0.bias"] = _t(be[f"input_proj_{l}"]["bias"])
        sd[f"base_encoder.input_proj.{l}.1.weight"] = _t(be[f"gn_{l}"]["scale"])
        sd[f"base_encoder.input_proj.{l}.1.bias"] = _t(be[f"gn_{l}"]["bias"])

    tr = pp["transformer"]
    pre = "unimodal_sparse_transformer"
    sd[f"{pre}.level_embed"] = _t(tr["level_embed"])
    dense(sd, f"{pre}.enc_output", tr["enc_output"])
    ln(sd, f"{pre}.enc_output_norm", tr["enc_output_norm"])
    dense(sd, f"{pre}.reference_points", tr["reference_points_head"])
    mp = tr["enc_mask_predictor"]
    ln(sd, f"{pre}.enc_mask_predictor.layer1.0", mp["norm"])
    dense(sd, f"{pre}.enc_mask_predictor.layer1.1", mp["dense_in"])
    dense(sd, f"{pre}.enc_mask_predictor.layer2.0", mp["dense_1"])
    dense(sd, f"{pre}.enc_mask_predictor.layer2.2", mp["dense_2"])
    dense(sd, f"{pre}.enc_mask_predictor.layer2.4", mp["dense_out"])

    for i in range(ENC):
        lp = tr[f"enc_layers_{i}"]
        base = f"{pre}.encoder.layers.{i}"
        msda(sd, f"{base}.self_attn", lp["self_attn"])
        ln(sd, f"{base}.norm1", lp["norm1"])
        ln(sd, f"{base}.norm2", lp["norm2"])
        dense(sd, f"{base}.linear1", lp["linear1"])
        dense(sd, f"{base}.linear2", lp["linear2"])
    for i in range(DEC):
        lp = tr[f"dec_layers_{i}"]
        base = f"{pre}.decoder.layers.{i}"
        msda(sd, f"{base}.cross_attn", lp["cross_attn"])
        mha(sd, f"{base}.self_attn", lp["self_attn"])
        ln(sd, f"{base}.norm1", lp["norm1"])
        ln(sd, f"{base}.norm2", lp["norm2"])
        ln(sd, f"{base}.norm3", lp["norm3"])
        dense(sd, f"{base}.linear1", lp["linear1"])
        dense(sd, f"{base}.linear2", lp["linear2"])

    cp = params["caption"]["params"]
    sd["unimodal_caption_decoder.target_embedding.embedder.weight"] = _t(
        cp["target_embedding"]["Embed_0"]["embedding"]
    )
    for i in range(CAPD):
        lp = cp[f"decoder_{i}"]
        base = f"unimodal_caption_decoder.decoder.{i}"
        cross_attention(sd, f"{base}.self_attention", lp["self_attention"])
        cross_attention(sd, f"{base}.cross_attention", lp["cross_attention"])
        for j in (1, 2, 3):
            ln(sd, f"{base}.layer_norm_{j}", lp[f"layer_norm_{j}"])
        dense(sd, f"{base}.mlp.fully_connected_1", lp["mlp"]["fully_connected_1"])
        dense(sd, f"{base}.mlp.fully_connected_2", lp["mlp"]["fully_connected_2"])
    dense(sd, "unimodal_caption_decoder.head", cp["head"])
    return sd


def make_inputs():
    rng = np.random.default_rng(0)
    video = rng.normal(size=(B, T, DM)).astype(np.float32)
    mask = np.zeros((B, T), dtype=bool)
    mask[1, T - 5 :] = True
    durations = np.array([40.0, 22.0], dtype=np.float32)
    centers = rng.uniform(0.25, 0.75, size=(B, G)).astype(np.float32)
    lengths = rng.uniform(0.1, 0.3, size=(B, G)).astype(np.float32)
    gt = np.stack([centers, lengths], -1)
    cap = np.full((B, G, LC), PAD, dtype=np.int32)
    for b in range(B):
        for g in range(G):
            n = int(rng.integers(2, LC - 2))
            cap[b, g, 0] = BOS
            cap[b, g, 1 : 1 + n] = rng.integers(4, VOCAB, size=n)
            cap[b, g, 1 + n] = EOS
    return video, mask, durations, gt, cap


@pytest.fixture(scope="module")
def world():
    cfg = our_cfg()
    model = build_model(cfg, VOCAB, PAD, BOS, EOS)
    video, mask, durations, gt, cap = make_inputs()
    batch = {
        "video_tensor": jnp.asarray(video),
        "video_mask": jnp.asarray(mask),
        "durations": jnp.asarray(durations),
        "gt_segments": jnp.asarray(gt),
        "gt_mask": jnp.ones((B, G), dtype=bool),
        "cap_tokens": jnp.asarray(cap),
    }
    params = model.init(jax.random.PRNGKey(0), batch)
    # the segment head is zero-initialized (reference init), which makes many
    # query segments coincide and the LSAP optimum non-unique; randomize the
    # final layer (transplanted into the torch model too) so assignments are
    # uniquely determined and comparable.
    import flax

    params = flax.core.unfreeze(params) if hasattr(flax.core, "unfreeze") else params
    seg_last = params["proposal"]["params"]["segment_embedding_decoder"]["layers_2"]
    key = jax.random.PRNGKey(42)
    seg_last["kernel"] = 0.1 * jax.random.normal(key, seg_last["kernel"].shape)
    seg_last["bias"] = 0.05 * jax.random.normal(key, seg_last["bias"].shape)

    ref = build_reference_model()
    sd = transplant(jax.device_get(params))
    missing, unexpected = ref.load_state_dict(sd, strict=False)
    # everything the reference actually uses must be covered
    used_missing = [
        m for m in missing
        if not m.startswith((
            "context_mask_model",
            "unimodal_caption_decoder.positional_encoding",
            "segment_embedding_encoder",  # enc-aux heads unused (aux loss off)
            "count_head_encoder",
        ))
    ]
    assert not unexpected, unexpected
    assert not used_missing, used_missing

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
    return cfg, model, params, batch, ref, obj


def test_full_forward_teacher_forcing_parity(world):
    cfg, model, params, batch, ref, obj = world

    with torch.no_grad():
        ref_out, ref_caps, ref_indices, _, _ = ref(
            obj, is_training=False, faster_eval=False, val_mode="teacher_forcing"
        )

    out, caps, indices, indices_aux, _ = model.forward_eval(params, batch, "teacher_forcing")

    np.testing.assert_allclose(
        np.asarray(out["pred_segments"]), ref_out["pred_segments"].numpy(),
        rtol=1e-3, atol=1e-4, err_msg="pred_segments",
    )
    np.testing.assert_allclose(
        np.asarray(out["pred_count"]), ref_out["pred_count"].numpy(),
        rtol=1e-3, atol=1e-4, err_msg="pred_count",
    )
    np.testing.assert_allclose(
        np.asarray(out["backbone_mask_prediction"]),
        ref_out["backbone_mask_prediction"].numpy(),
        rtol=1e-3, atol=1e-4, err_msg="saliency",
    )

    # matcher assignments: convert reference (src, tgt) lists to col_to_row
    ours = np.asarray(indices)
    for b, (src, tgt) in enumerate(ref_indices):
        ref_map = {int(t): int(s) for s, t in zip(src.numpy(), tgt.numpy())}
        for g in range(G):
            assert ours[b, g] == ref_map[g], (b, g, ours[b], ref_map)

    # caption probabilities (ours are log-probs)
    ref_probs = ref_out["pred_captions"].numpy()  # (N, LC-1, V) softmax probs
    our_probs = np.exp(np.asarray(out["pred_captions"]))
    np.testing.assert_allclose(our_probs, ref_probs, rtol=2e-3, atol=2e-4,
                               err_msg="caption probs")

    # argmaxed teacher-forcing captions: exact token match
    np.testing.assert_array_equal(np.asarray(caps), ref_caps.numpy())


def test_greedy_decode_parity(world):
    """one_by_one eval: our KV-cached lax.scan greedy vs the reference's
    full-recompute word loop — exact token equality on the real model."""
    cfg, model, params, batch, ref, obj = world

    with torch.no_grad():
        _, ref_caps, *_ = ref(obj, is_training=False, faster_eval=False,
                              val_mode="one_by_one")
    _, caps, *_ = model.forward_eval(params, batch, "one_by_one")
    np.testing.assert_array_equal(np.asarray(caps), ref_caps.numpy())