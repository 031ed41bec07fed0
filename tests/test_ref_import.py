"""Reference-checkpoint import: torch state_dict -> our flax params.

Migration path for users of the reference: a checkpoint trained with the
reference's main.py (saved as {'model': state_dict, ...}, main.py:129-134)
loads into this framework's params bit-exactly. Verified two ways:

1. round-trip: our params -> transplant() -> import_reference_state_dict()
   reproduces the original tree bit-identically (both enc-aux variants);
2. reference-direction: the *actual reference torch model's* own state_dict
   imports with no leftover used keys, and transplanting back reproduces
   every covered tensor bit-identically (so trained reference weights land
   exactly where the full-model parity test proved forward equivalence).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from multimodal_feature_learning_tpu.config import load_config_train
from multimodal_feature_learning_tpu.models.dvc import build_model
from multimodal_feature_learning_tpu.utils import ref_bridge

B, T, DM, LVL, HEADS, ENC, DEC, CAPD, Q, G, LC, VOCAB = (
    2, 24, 64, 3, 2, 2, 2, 2, 6, 3, 8, 40
)
PAD, BOS, EOS = 1, 2, 3


class VocabStub(dict):
    def __init__(self):
        super().__init__({"<unk>": 0, "<pad>": PAD, "<bos>": BOS, "<eos>": EOS})

    def __len__(self):
        return VOCAB


def tiny_cfg(use_enc_aux_loss=False):
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
    cfg.dvc.detr.use_enc_aux_loss = use_enc_aux_loss
    cfg.dvc.caption.d_model = DM
    cfg.dvc.caption.depth = CAPD
    cfg.dvc.caption.num_heads = HEADS
    cfg.dataset.activity_net.video_rescale_len = T
    cfg.dataset.activity_net.max_caption_len_all = LC
    cfg.dataset.activity_net.max_gt_target_segments = G
    return cfg


def init_params(cfg, seed):
    model = build_model(cfg, VOCAB, PAD, BOS, EOS)
    rng = np.random.default_rng(0)
    batch = {
        "video_tensor": jnp.asarray(rng.normal(size=(B, T, DM)).astype(np.float32)),
        "video_mask": jnp.zeros((B, T), dtype=bool),
        "durations": jnp.asarray([40.0, 22.0], dtype=jnp.float32),
        "gt_segments": jnp.asarray(
            np.stack([np.full((B, G), 0.5, np.float32),
                      np.full((B, G), 0.2, np.float32)], -1)),
        "gt_mask": jnp.ones((B, G), dtype=bool),
        "cap_tokens": jnp.full((B, G, LC), PAD, dtype=jnp.int32),
    }
    return model.init(jax.random.PRNGKey(seed), batch)


def assert_trees_bit_identical(a, b):
    la, ta = jax.tree_util.tree_flatten(a)
    lb, tb = jax.tree_util.tree_flatten(b)
    assert ta == tb
    for xa, xb in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))


@pytest.mark.parametrize("enc_aux,diff_mask",
                         [(False, False), (True, False), (False, True)])
def test_roundtrip_bit_identical(enc_aux, diff_mask):
    cfg = tiny_cfg(use_enc_aux_loss=enc_aux)
    cfg.use_differentiable_mask = diff_mask
    params = init_params(cfg, seed=0)
    if diff_mask:
        assert "context_mask" in params  # exercised below via the round-trip
    sd = ref_bridge.transplant(jax.device_get(params), cfg)

    template = init_params(cfg, seed=1)  # different values, same structure
    imported, leftover = ref_bridge.import_reference_state_dict(sd, template, cfg)
    assert leftover == []
    assert_trees_bit_identical(imported, params)


def test_mismatched_checkpoint_rejected():
    # a checkpoint from a different architecture config must fail loudly at
    # import with the offending leaf named, not as an XLA error at forward
    cfg = tiny_cfg()
    sd = ref_bridge.transplant(jax.device_get(init_params(cfg, seed=0)), cfg)
    cfg_small = tiny_cfg()
    cfg_small.dvc.detr.transformer_ff_dim = 64
    template = init_params(cfg_small, seed=1)
    with pytest.raises(ValueError, match="does not match"):
        ref_bridge.import_reference_state_dict(sd, template, cfg_small)


def test_non_flagship_params_rejected():
    cfg = tiny_cfg()
    with pytest.raises(ValueError, match="UnimodalSparseDVC"):
        ref_bridge.import_reference_state_dict({}, {"encoder": {}}, cfg)


def test_context_mask_imports_for_finetune():
    # the reference trains context_mask_model via the `contexts` loss even
    # though its eval path never reads it — migration must carry it over
    rng = np.random.default_rng(7)
    cfg = tiny_cfg()
    cfg.use_differentiable_mask = True
    params = init_params(cfg, seed=0)
    sd = ref_bridge.transplant(jax.device_get(params), cfg)
    assert "context_mask" in params
    cm = params["context_mask"]["params"]
    for i in (1, 2, 3):
        k = np.asarray(cm[f"layer_{i}"]["kernel"])
        sd[f"context_mask_model.layer_{i}.weight"] = __import__("torch").from_numpy(
            rng.normal(size=k.T.shape).astype(np.float32))
        sd[f"context_mask_model.layer_{i}.bias"] = __import__("torch").from_numpy(
            rng.normal(size=k.shape[1]).astype(np.float32))

    imported, leftover = ref_bridge.import_reference_state_dict(sd, params, cfg)
    assert leftover == []
    got = imported["context_mask"]["params"]
    for i in (1, 2, 3):
        np.testing.assert_array_equal(
            got[f"layer_{i}"]["kernel"],
            sd[f"context_mask_model.layer_{i}.weight"].numpy().T)
        np.testing.assert_array_equal(
            got[f"layer_{i}"]["bias"],
            sd[f"context_mask_model.layer_{i}.bias"].numpy())


@pytest.mark.slow
def test_migration_cli_end_to_end(tmp_path):
    """inference.py --from-reference-checkpoint on the synthetic world: a
    reference-format .pth generated from the actual torch model loads through
    the CLI and a scored eval completes (the turnkey migration path)."""
    import os
    import subprocess
    import sys as _sys

    torch = pytest.importorskip("torch")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/mfl_jax_cache_tests"

    tiny_overrides = [
        "dvc.d_model=64", "dvc.num_queries=6",
        "dvc.detr.feature_dim=64", "dvc.detr.d_model=64",
        "dvc.detr.num_heads=2", "dvc.detr.enc_layers=2",
        "dvc.detr.dec_layers=2", "dvc.detr.transformer_ff_dim=128",
        "dvc.detr.video_rescale_len=24", "dvc.detr.num_feature_levels=3",
        "dvc.caption.d_model=64", "dvc.caption.depth=2",
        "dvc.caption.num_heads=2",
        "dataset.activity_net.video_rescale_len=24",
        "dataset.activity_net.max_caption_len_all=8",
        "dataset.activity_net.max_gt_target_segments=4",
    ]

    # generate the reference-format .pth against the synthetic world's vocab
    gen = (
        "import sys; sys.path.insert(0, %r)\n"
        "import torch\n"
        "from main import apply_overrides, make_synthetic_world\n"
        "from multimodal_feature_learning_tpu.config import load_config, recompute_losses\n"
        "from multimodal_feature_learning_tpu.data.anet import build_dataset\n"
        "from multimodal_feature_learning_tpu.utils import ref_bridge\n"
        "cfg = load_config('train'); cfg = make_synthetic_world(cfg)\n"
        "cfg = apply_overrides(cfg, %r); recompute_losses(cfg)\n"
        "_, vocab = build_dataset('val', cfg)\n"
        "class V(dict):\n"
        "    def __init__(s, n):\n"
        "        super().__init__({'<unk>': 0, '<pad>': 1, '<bos>': 2, '<eos>': 3}); s.n = n\n"
        "    def __len__(s): return s.n\n"
        "ref = ref_bridge.build_reference_model(cfg, V(len(vocab)))\n"
        "torch.save({'model': ref.state_dict(), 'epoch': 0}, %r)\n"
    ) % (repo, tiny_overrides, str(tmp_path / "ref.pth"))
    r = subprocess.run([_sys.executable, "-c", gen], cwd=str(tmp_path), env=env,
                       capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-3000:]

    r = subprocess.run(
        [_sys.executable, os.path.join(repo, "inference.py"), "--synthetic",
         "--from-reference-checkpoint", str(tmp_path / "ref.pth"),
         "--batch-size", "8", "--config-overrides", *tiny_overrides],
        cwd=str(tmp_path), env=env, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "imported reference checkpoint" in r.stdout
    assert "val stats:" in r.stdout


@pytest.mark.slow
def test_reference_checkpoint_loads(tmp_path):
    torch = pytest.importorskip("torch")
    cfg = tiny_cfg(use_enc_aux_loss=False)
    ref = ref_bridge.build_reference_model(cfg, VocabStub())
    sd_ref = ref.state_dict()

    path = tmp_path / "checkpoint.pth"
    torch.save({"model": sd_ref, "epoch": 7}, path)

    template = init_params(cfg, seed=3)
    imported, leftover = ref_bridge.load_reference_checkpoint(str(path), template, cfg)
    # every checkpoint key either loaded or is a param the eval path never
    # reads: dead modules (_UNUSED_PREFIXES, filtered inside the importer)
    # and the enc-aux heads the torch model instantiates even when
    # use_enc_aux_loss is off (unimodal_sparse_dvc.py:80-87)
    dead = ("segment_embedding_encoder", "count_head_encoder",
            "unimodal_sparse_transformer.encoder.segment_embedding",
            "unimodal_sparse_transformer.encoder.count_head")
    unexplained = [k for k in leftover if not k.startswith(dead)]
    assert unexplained == [], unexplained[:5]

    # transplant back: every covered tensor must round-trip bit-exactly
    sd_back = ref_bridge.transplant(jax.device_get(imported), cfg)
    assert set(sd_back).issubset(set(sd_ref))
    for k, v in sd_back.items():
        np.testing.assert_array_equal(
            v.numpy(), sd_ref[k].detach().cpu().numpy(), err_msg=k)
