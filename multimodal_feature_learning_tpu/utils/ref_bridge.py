"""Bridge to the reference PyTorch implementation (oracle execution only).

Builds the reference ``UnimodalSparseDVC`` (models/sparse/unimodal_sparse_dvc.py)
at arbitrary dims from our config and transplants our flax params into its
state_dict, so the two systems can be compared head-to-head on identical
weights — teacher-forcing logits, greedy tokens, and full METEOR/CIDEr
submissions (tools/quality_compare.py). Generalizes the fixed-dims transplant
from tests/test_full_model_parity.py.

The reference tree is imported for *execution as an oracle*, never copied.
"""

from __future__ import annotations

import sys
from typing import Dict


def make_reference_importable(ref_root: str = "/root/reference") -> None:
    """Stub the heavy modules absent from this image and add the reference
    tree to sys.path."""
    from unittest import mock

    tv = mock.MagicMock()
    tv.__version__ = "0.15.0"
    sys.modules.setdefault("torchvision", tv)
    for name in (
        "torchaudio", "torchaudio.compliance", "torchaudio.compliance.kaldi",
        "wandb", "timm",
    ):
        sys.modules.setdefault(name, mock.MagicMock())
    if ref_root not in sys.path:
        sys.path.insert(0, ref_root)


def build_reference_model(cfg, vocab, embedding_matrix=None):
    """Reference UnimodalSparseDVC with dims mirrored from our config tree
    (reference models/__init__.py:34-77 builder semantics)."""
    import ml_collections

    make_reference_importable()
    from models.matcher import HungarianMatcher  # noqa: E402 (reference)
    from models.sparse.unimodal_sparse_dvc import UnimodalSparseDVC  # noqa: E402

    det = cfg.dvc.detr
    sd = ml_collections.ConfigDict()
    sd.feature_dim = det.feature_dim
    sd.d_model = det.d_model
    sd.num_heads = det.num_heads
    sd.num_feature_levels = det.num_feature_levels
    sd.dec_n_points = det.dec_n_points
    sd.enc_n_points = det.enc_n_points
    sd.enc_layers = det.enc_layers
    sd.dec_layers = det.dec_layers
    sd.transformer_dropout_prob = 0.0
    sd.transformer_ff_dim = det.transformer_ff_dim
    sd.video_rescale_len = det.video_rescale_len
    sd.rho = det.rho
    sd.use_enc_aux_loss = det.use_enc_aux_loss
    sd.return_intermediate = det.return_intermediate
    sd.eff_query_init = False
    sd.eff_specific_head = False

    c = cfg.dvc.caption
    cap = ml_collections.ConfigDict()
    cap.d_model = c.d_model
    cap.depth = c.depth
    cap.num_heads = c.num_heads
    cap.mlp_ratio = c.mlp_ratio
    cap.qkv_bias = c.qkv_bias
    cap.positional_embedding_dropout = 0.0
    cap.attention_dropout = 0.0
    cap.projection_dropout = 0.0
    cap.bridge_dropout = 0.0
    cap.mlp_dropout_1 = 0.0
    cap.mlp_dropout_2 = 0.0
    cap.pre_norm = c.pre_norm
    cap.model_official = None
    cap.weight_init = False
    cap.weight_load = False
    cap.emb_weights_req_grad = c.emb_weights_req_grad
    cap.return_intermediate = c.return_intermediate

    m = cfg.dvc.matcher
    matcher = HungarianMatcher(
        m.cost_class, m.cost_segment, m.cost_giou, m.cost_alpha, m.cost_gamma
    )
    model = UnimodalSparseDVC(
        input_modalities=["video"],
        num_queries=cfg.dvc.num_queries,
        d_model=cfg.dvc.d_model,
        num_classes=cfg.dvc.num_classes,
        aux_loss=cfg.dvc.aux_loss,
        matcher=matcher,
        threshold=cfg.dvc.threshold,
        max_eseq_length=cfg.dvc.max_eseq_length,
        vocab=vocab,
        seq_len=cfg.dataset.activity_net.max_caption_len_all,
        embedding_matrix=embedding_matrix,
        sparse_detr_args=sd,
        caption_args=cap,
        use_differentiable_mask=False,
    )
    model.eval()
    return model


# -- weight transplant: flax params -> torch state_dict -------------------------


def _t(a):
    import numpy as np
    import torch

    return torch.from_numpy(np.array(a))


def _dense(sd, torch_name, p):
    sd[f"{torch_name}.weight"] = _t(p["kernel"]).T.contiguous()
    if "bias" in p:
        sd[f"{torch_name}.bias"] = _t(p["bias"])


def _ln(sd, torch_name, p):
    sd[f"{torch_name}.weight"] = _t(p["scale"])
    sd[f"{torch_name}.bias"] = _t(p["bias"])


def _cross_attention(sd, torch_name, p):
    _dense(sd, f"{torch_name}.q_linear", p["q_linear"])
    _dense(sd, f"{torch_name}.k_linear", p["k_linear"])
    _dense(sd, f"{torch_name}.v_linear", p["v_linear"])
    _dense(sd, f"{torch_name}.projection_layer", p["projection_layer"])


def _msda(sd, torch_name, p):
    for sub in ("sampling_offsets", "attention_weights", "value_proj", "output_proj"):
        _dense(sd, f"{torch_name}.{sub}", p[sub])


def _mha(sd, torch_name, p):
    import torch

    wq = _t(p["q_linear"]["kernel"]).T
    wk = _t(p["k_linear"]["kernel"]).T
    wv = _t(p["v_linear"]["kernel"]).T
    sd[f"{torch_name}.in_proj_weight"] = torch.cat([wq, wk, wv]).contiguous()
    sd[f"{torch_name}.in_proj_bias"] = torch.cat(
        [_t(p["q_linear"]["bias"]), _t(p["k_linear"]["bias"]), _t(p["v_linear"]["bias"])]
    )
    _dense(sd, f"{torch_name}.out_proj", p["projection_layer"])


def transplant(params, cfg) -> Dict:
    """flax params pytree -> reference state_dict (all dims from cfg)."""
    det = cfg.dvc.detr
    sd: Dict = {}
    pp = params["proposal"]["params"]
    sd["query_embedding.weight"] = _t(pp["query_embedding"])
    for enc_dec, pname in (("encoder", "segment_embedding_encoder"),
                           ("decoder", "segment_embedding_decoder")):
        if pname in pp:  # encoder heads exist only with use_enc_aux_loss
            for i in range(3):
                _dense(sd, f"segment_embedding_{enc_dec}.layers.{i}", pp[pname][f"layers_{i}"])
    if "count_head_encoder" in pp:
        _dense(sd, "count_head_encoder", pp["count_head_encoder"])
    _dense(sd, "count_head_decoder", pp["count_head_decoder"])

    be = pp["base_encoder"]
    _dense(sd, "pos_embed.duration_embed_layer", be["pos_embed"]["duration_embed_layer"])
    for lvl in range(det.num_feature_levels):
        k = _t(be[f"input_proj_{lvl}"]["kernel"])  # (k, in, out)
        sd[f"base_encoder.input_proj.{lvl}.0.weight"] = k.permute(2, 1, 0).contiguous()
        sd[f"base_encoder.input_proj.{lvl}.0.bias"] = _t(be[f"input_proj_{lvl}"]["bias"])
        sd[f"base_encoder.input_proj.{lvl}.1.weight"] = _t(be[f"gn_{lvl}"]["scale"])
        sd[f"base_encoder.input_proj.{lvl}.1.bias"] = _t(be[f"gn_{lvl}"]["bias"])

    tr = pp["transformer"]
    pre = "unimodal_sparse_transformer"
    sd[f"{pre}.level_embed"] = _t(tr["level_embed"])
    _dense(sd, f"{pre}.enc_output", tr["enc_output"])
    _ln(sd, f"{pre}.enc_output_norm", tr["enc_output_norm"])
    _dense(sd, f"{pre}.reference_points", tr["reference_points_head"])
    mp = tr["enc_mask_predictor"]
    _ln(sd, f"{pre}.enc_mask_predictor.layer1.0", mp["norm"])
    _dense(sd, f"{pre}.enc_mask_predictor.layer1.1", mp["dense_in"])
    _dense(sd, f"{pre}.enc_mask_predictor.layer2.0", mp["dense_1"])
    _dense(sd, f"{pre}.enc_mask_predictor.layer2.2", mp["dense_2"])
    _dense(sd, f"{pre}.enc_mask_predictor.layer2.4", mp["dense_out"])

    # with use_enc_aux_loss the torch model aliases the encoder heads into the
    # transformer encoder (unimodal_sparse_dvc.py:85-87); state_dict then
    # carries both names for the same tensors
    if det.use_enc_aux_loss and "segment_embedding_encoder" in pp:
        for i in range(3):
            _dense(sd, f"{pre}.encoder.segment_embedding.layers.{i}",
                   pp["segment_embedding_encoder"][f"layers_{i}"])
        _dense(sd, f"{pre}.encoder.count_head", pp["count_head_encoder"])

    for i in range(det.enc_layers):
        lp = tr[f"enc_layers_{i}"]
        base = f"{pre}.encoder.layers.{i}"
        _msda(sd, f"{base}.self_attn", lp["self_attn"])
        _ln(sd, f"{base}.norm1", lp["norm1"])
        _ln(sd, f"{base}.norm2", lp["norm2"])
        _dense(sd, f"{base}.linear1", lp["linear1"])
        _dense(sd, f"{base}.linear2", lp["linear2"])
    for i in range(det.dec_layers):
        lp = tr[f"dec_layers_{i}"]
        base = f"{pre}.decoder.layers.{i}"
        _msda(sd, f"{base}.cross_attn", lp["cross_attn"])
        _mha(sd, f"{base}.self_attn", lp["self_attn"])
        _ln(sd, f"{base}.norm1", lp["norm1"])
        _ln(sd, f"{base}.norm2", lp["norm2"])
        _ln(sd, f"{base}.norm3", lp["norm3"])
        _dense(sd, f"{base}.linear1", lp["linear1"])
        _dense(sd, f"{base}.linear2", lp["linear2"])

    cp = params["caption"]["params"]
    sd["unimodal_caption_decoder.target_embedding.embedder.weight"] = _t(
        cp["target_embedding"]["Embed_0"]["embedding"]
    )
    for i in range(cfg.dvc.caption.depth):
        lp = cp[f"decoder_{i}"]
        base = f"unimodal_caption_decoder.decoder.{i}"
        _cross_attention(sd, f"{base}.self_attention", lp["self_attention"])
        _cross_attention(sd, f"{base}.cross_attention", lp["cross_attention"])
        for j in (1, 2, 3):
            _ln(sd, f"{base}.layer_norm_{j}", lp[f"layer_norm_{j}"])
        _dense(sd, f"{base}.mlp.fully_connected_1", lp["mlp"]["fully_connected_1"])
        _dense(sd, f"{base}.mlp.fully_connected_2", lp["mlp"]["fully_connected_2"])
    _dense(sd, "unimodal_caption_decoder.head", cp["head"])

    # symmetric with the importer: a context mask trained here (contexts loss)
    # must survive the trip back to the reference
    if "context_mask" in params:
        cm = params["context_mask"]["params"]
        for i in (1, 2, 3):
            _dense(sd, f"context_mask_model.layer_{i}", cm[f"layer_{i}"])
    return sd


# torch-side params the reference never uses on the eval path
_UNUSED_PREFIXES = (
    "context_mask_model",
    "unimodal_caption_decoder.positional_encoding",
)


# -- inverse: reference torch checkpoint -> flax params -------------------------
#
# Lets a user of the reference bring their *trained* PyTorch checkpoints
# (main.py:129-134 saves {'model': state_dict, ...}) into this framework.
# Exact inverse of `transplant` above; round-trip is bit-identical
# (tests/test_ref_import.py).


def _a(t):
    import numpy as np

    return np.ascontiguousarray(t.detach().cpu().numpy())


class _SDReader:
    """state_dict view that records which keys were consumed."""

    def __init__(self, sd):
        self.sd = sd
        self.used = set()

    def __call__(self, key):
        self.used.add(key)
        return self.sd[key]


def _inv_dense(r, torch_name, p):
    p["kernel"] = _a(r(f"{torch_name}.weight")).T.copy()
    if "bias" in p:
        p["bias"] = _a(r(f"{torch_name}.bias"))


def _inv_ln(r, torch_name, p):
    p["scale"] = _a(r(f"{torch_name}.weight"))
    p["bias"] = _a(r(f"{torch_name}.bias"))


def _inv_cross_attention(r, torch_name, p):
    _inv_dense(r, f"{torch_name}.q_linear", p["q_linear"])
    _inv_dense(r, f"{torch_name}.k_linear", p["k_linear"])
    _inv_dense(r, f"{torch_name}.v_linear", p["v_linear"])
    _inv_dense(r, f"{torch_name}.projection_layer", p["projection_layer"])


def _inv_msda(r, torch_name, p):
    for sub in ("sampling_offsets", "attention_weights", "value_proj", "output_proj"):
        _inv_dense(r, f"{torch_name}.{sub}", p[sub])


def _inv_mha(r, torch_name, p):
    w = _a(r(f"{torch_name}.in_proj_weight"))  # (3d, d) rows = [q; k; v]
    b = _a(r(f"{torch_name}.in_proj_bias"))
    d = w.shape[1]
    for i, name in enumerate(("q_linear", "k_linear", "v_linear")):
        p[name]["kernel"] = w[i * d:(i + 1) * d].T.copy()
        p[name]["bias"] = b[i * d:(i + 1) * d]
    _inv_dense(r, f"{torch_name}.out_proj", p["projection_layer"])


def import_reference_state_dict(state_dict, params, cfg):
    """Reference UnimodalSparseDVC state_dict -> flax params pytree.

    ``params`` is a template with the right structure (e.g. ``model.init(...)``
    or a fresh TrainState's params); returns a new tree with every leaf the
    reference eval path uses replaced by the checkpoint value. Raises if a
    needed key is absent; warns (returns them) for checkpoint keys that have
    no counterpart here (the reference's dead eval-path params, see
    ``_UNUSED_PREFIXES``).
    """
    import copy

    import flax
    import jax

    # str, not tuple: tuples are pytree nodes and would flatten misaligned
    template_shapes = jax.tree_util.tree_map(lambda x: str(tuple(x.shape)), params)
    params = copy.deepcopy(flax.core.unfreeze(params))
    if not (isinstance(params, dict) and "proposal" in params and "caption" in params):
        raise ValueError(
            "reference-checkpoint import supports the flagship UnimodalSparseDVC "
            "family only (the other reference families cannot produce "
            "checkpoints — their forwards are unrunnable upstream, MIGRATION.md); "
            f"got a params tree with top-level keys {sorted(params)}"
        )
    det = cfg.dvc.detr
    r = _SDReader(state_dict)

    pp = params["proposal"]["params"]
    pp["query_embedding"] = _a(r("query_embedding.weight"))
    for enc_dec, pname in (("encoder", "segment_embedding_encoder"),
                           ("decoder", "segment_embedding_decoder")):
        if pname in pp:
            for i in range(3):
                _inv_dense(r, f"segment_embedding_{enc_dec}.layers.{i}",
                           pp[pname][f"layers_{i}"])
    if "count_head_encoder" in pp:
        _inv_dense(r, "count_head_encoder", pp["count_head_encoder"])
    _inv_dense(r, "count_head_decoder", pp["count_head_decoder"])

    be = pp["base_encoder"]
    _inv_dense(r, "pos_embed.duration_embed_layer",
               be["pos_embed"]["duration_embed_layer"])
    for lvl in range(det.num_feature_levels):
        # torch Conv1d (out, in, k) -> flax (k, in, out)
        k = _a(r(f"base_encoder.input_proj.{lvl}.0.weight"))
        be[f"input_proj_{lvl}"]["kernel"] = k.transpose(2, 1, 0).copy()
        be[f"input_proj_{lvl}"]["bias"] = _a(r(f"base_encoder.input_proj.{lvl}.0.bias"))
        be[f"gn_{lvl}"]["scale"] = _a(r(f"base_encoder.input_proj.{lvl}.1.weight"))
        be[f"gn_{lvl}"]["bias"] = _a(r(f"base_encoder.input_proj.{lvl}.1.bias"))

    tr = pp["transformer"]
    pre = "unimodal_sparse_transformer"
    tr["level_embed"] = _a(r(f"{pre}.level_embed"))
    _inv_dense(r, f"{pre}.enc_output", tr["enc_output"])
    _inv_ln(r, f"{pre}.enc_output_norm", tr["enc_output_norm"])
    _inv_dense(r, f"{pre}.reference_points", tr["reference_points_head"])
    mp = tr["enc_mask_predictor"]
    _inv_ln(r, f"{pre}.enc_mask_predictor.layer1.0", mp["norm"])
    _inv_dense(r, f"{pre}.enc_mask_predictor.layer1.1", mp["dense_in"])
    _inv_dense(r, f"{pre}.enc_mask_predictor.layer2.0", mp["dense_1"])
    _inv_dense(r, f"{pre}.enc_mask_predictor.layer2.2", mp["dense_2"])
    _inv_dense(r, f"{pre}.enc_mask_predictor.layer2.4", mp["dense_out"])
    if det.use_enc_aux_loss and "segment_embedding_encoder" in pp:
        # aliased duplicates of the top-level encoder heads
        # (unimodal_sparse_dvc.py:85-87) — consume, values already loaded
        for i in range(3):
            for wb in ("weight", "bias"):
                r(f"{pre}.encoder.segment_embedding.layers.{i}.{wb}")
        r(f"{pre}.encoder.count_head.weight"), r(f"{pre}.encoder.count_head.bias")

    for i in range(det.enc_layers):
        lp = tr[f"enc_layers_{i}"]
        base = f"{pre}.encoder.layers.{i}"
        _inv_msda(r, f"{base}.self_attn", lp["self_attn"])
        _inv_ln(r, f"{base}.norm1", lp["norm1"])
        _inv_ln(r, f"{base}.norm2", lp["norm2"])
        _inv_dense(r, f"{base}.linear1", lp["linear1"])
        _inv_dense(r, f"{base}.linear2", lp["linear2"])
    for i in range(det.dec_layers):
        lp = tr[f"dec_layers_{i}"]
        base = f"{pre}.decoder.layers.{i}"
        _inv_msda(r, f"{base}.cross_attn", lp["cross_attn"])
        _inv_mha(r, f"{base}.self_attn", lp["self_attn"])
        _inv_ln(r, f"{base}.norm1", lp["norm1"])
        _inv_ln(r, f"{base}.norm2", lp["norm2"])
        _inv_ln(r, f"{base}.norm3", lp["norm3"])
        _inv_dense(r, f"{base}.linear1", lp["linear1"])
        _inv_dense(r, f"{base}.linear2", lp["linear2"])

    # context-mask MLP: dead on the reference's eval path but trained by the
    # `contexts` loss — carry it over so fine-tuning resumes where it left off
    if "context_mask" in params and "context_mask_model.layer_1.weight" in state_dict:
        cm = params["context_mask"]["params"]
        for i in (1, 2, 3):
            _inv_dense(r, f"context_mask_model.layer_{i}", cm[f"layer_{i}"])

    cp = params["caption"]["params"]
    cp["target_embedding"]["Embed_0"]["embedding"] = _a(
        r("unimodal_caption_decoder.target_embedding.embedder.weight")
    )
    for i in range(cfg.dvc.caption.depth):
        lp = cp[f"decoder_{i}"]
        base = f"unimodal_caption_decoder.decoder.{i}"
        _inv_cross_attention(r, f"{base}.self_attention", lp["self_attention"])
        _inv_cross_attention(r, f"{base}.cross_attention", lp["cross_attention"])
        for j in (1, 2, 3):
            _inv_ln(r, f"{base}.layer_norm_{j}", lp[f"layer_norm_{j}"])
        _inv_dense(r, f"{base}.mlp.fully_connected_1", lp["mlp"]["fully_connected_1"])
        _inv_dense(r, f"{base}.mlp.fully_connected_2", lp["mlp"]["fully_connected_2"])
    _inv_dense(r, "unimodal_caption_decoder.head", cp["head"])

    # a checkpoint from a mismatched config (different d_model / layers /
    # vocab) must fail HERE with the offending leaf named, not as a cryptic
    # XLA shape error at first forward — and never silently (a same-rank
    # wrong-size embedding would otherwise garble every caption)
    shape_str = lambda t: jax.tree_util.tree_map(lambda x: str(tuple(x.shape)), t)
    old_leaves = jax.tree_util.tree_flatten_with_path(template_shapes)[0]
    new_leaves = jax.tree_util.tree_flatten_with_path(shape_str(params))[0]
    bad = [
        (jax.tree_util.keystr(kp), old, new)
        for (kp, old), (_, new) in zip(old_leaves, new_leaves)
        if old != new
    ]
    if bad:
        raise ValueError(
            "reference checkpoint does not match this model's config "
            "(leaf, expected shape, checkpoint shape): " + repr(bad[:5])
        )

    leftover = sorted(
        k for k in state_dict
        if k not in r.used and not k.startswith(_UNUSED_PREFIXES)
    )
    return params, leftover


def load_reference_checkpoint(path, params, cfg, trust_pickle: bool = False):
    """Load a reference ``torch.save``d checkpoint file (main.py:129-134
    format, ``{'model': state_dict, ...}``, or a bare state_dict) into our
    params. Returns (params, leftover_keys).

    Safe by default: tensors are read with ``weights_only=True`` (no pickle
    code execution). Reference checkpoints carry non-tensor extras
    (ConfigDict, optimizer state) that weights_only rejects; loading those
    requires the full unpickler, which executes arbitrary code from the file
    — pass ``trust_pickle=True`` (CLI: ``--trust-checkpoint``) only for
    checkpoints from a trusted source."""
    import torch

    try:
        # safe path first: no arbitrary pickle execution from a shared .pth
        ckpt = torch.load(path, map_location="cpu", weights_only=True)
    except Exception as e:
        if not trust_pickle:
            raise ValueError(
                f"{path}: safe (weights_only) load failed: {e}. The file "
                "needs the full pickle loader, which executes code embedded "
                "in the checkpoint; re-run with --trust-checkpoint (or "
                "trust_pickle=True) if you trust its source."
            ) from e
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
    return import_reference_state_dict(sd, params, cfg)


def load_into_reference(ref_model, state_dict) -> None:
    """Strict-for-used-params load of a transplanted state_dict."""
    allowed = _UNUSED_PREFIXES
    # the torch model always instantiates the enc-aux heads; they exist in our
    # params (and the transplant) only when use_enc_aux_loss is on
    if "segment_embedding_encoder.layers.0.weight" not in state_dict:
        allowed = allowed + ("segment_embedding_encoder", "count_head_encoder")
    missing, unexpected = ref_model.load_state_dict(state_dict, strict=False)
    used_missing = [m for m in missing if not m.startswith(allowed)]
    # context_mask_model keys are emitted whenever our params carry them, but
    # the torch model instantiates the module only with the mask flag on
    unexpected = [u for u in unexpected if not u.startswith(_UNUSED_PREFIXES)]
    if unexpected:
        raise ValueError(f"unexpected keys in transplant: {unexpected[:5]}")
    if used_missing:
        raise ValueError(f"reference params not covered: {used_missing[:5]}")
