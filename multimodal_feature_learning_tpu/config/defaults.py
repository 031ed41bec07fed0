"""Typed configuration tree for the TPU DVC framework.

Hyperparameter values follow the reference's shipped training config
(``config/config_dvc_train.py``); the structure is reorganized:
one ``ConfigDict`` with a mode switch selectable from the CLI instead of a
hardcoded ``is_train`` boolean (reference config/config_dvc.py:11).
"""

from __future__ import annotations

import os

import ml_collections

# Real ActivityNet Captions annotations: prefer a local ./anet_data, fall back
# to the read-only reference copy so `python main.py` runs on real annotations
# with no flags (reference keeps them at anet_data/, README.md:21-27).
_ANET_FALLBACK = "/root/reference/anet_data"


def _default_anet_path() -> str:
    if os.path.isdir("./anet_data"):
        return "./anet_data"
    if os.path.isdir(_ANET_FALLBACK):
        return _ANET_FALLBACK
    return "./anet_data"


def load_config_train() -> ml_collections.ConfigDict:
    cfg = ml_collections.ConfigDict()

    # -- general -------------------------------------------------------------
    cfg.seed = 0
    cfg.batch_size = 16
    cfg.num_workers = 1
    cfg.print_freq = 10

    cfg.lr = 1e-4
    cfg.lr_drop = 40          # StepLR: lr *= 0.1 every lr_drop epochs
    cfg.weight_decay = 1e-4
    cfg.clip_max_norm = 0.1

    cfg.checkpoint_rate = 10
    cfg.eval_rate = 10
    cfg.model_mode = "training"  # training | validation | testing
    cfg.epochs = 200
    cfg.start_epoch = 0
    cfg.resume = ""

    cfg.output_dir = "output"
    cfg.submission_dir = "output/submission"
    cfg.save_submission = True

    cfg.use_raw_videos = False
    cfg.use_differentiable_mask = True

    # numerics: bf16 compute with f32 params/activations where it matters
    cfg.compute_dtype = "float32"
    # greedy-decode backend for eval/serve: "xla" (lax.scan of XLA kernels)
    # or "fused" (one Pallas decode-step kernel per token running all
    # caption-decoder layers; ops/fused_decode.py — exact-token parity in
    # interpret mode per tests/test_fused_decode.py; ON-CHIP the Mosaic
    # build flips near-tie argmaxes vs the XLA scan: 84.7% of event rows
    # exact / 94.5% token agreement measured at conv_e79 bf16,
    # tools/onchip_decode_parity.py). "fused" requires the grouped
    # shared-KV memory layout, i.e. the unimodal feature families; it also
    # measured SLOWER than xla on-chip in both grids (PERF.md round 5), so
    # xla is the default on merit, not caution.
    cfg.decode_impl = "xla"
    # cross-attn memory K/V precision for the FUSED decode: "dense" keeps the
    # compute dtype; "int8" quantizes per token (halves the dominant decode
    # HBM stream; measured on-chip at conv_e79: 82.9% event rows / 93.4%
    # tokens agree with the xla path, and NO speed win — the decode is
    # latency-bound, not K/V-bandwidth-bound; PERF.md round 5. Score-level
    # deltas in QUALITY.md "int8" section.)
    cfg.decode_kv = "dense"
    # fused-kernel grid: "video" = one program per (layer, video) — measured
    # 1.3x SLOWER than xla on-chip (PERF.md r5: 20-row matmuls + ~10us/program
    # sequencing dominate); "batch" = Bt videos per program with
    # block-diagonal attention (restores (Bt*2G, D)-row matmuls)
    cfg.decode_fused_grid = "video"
    # TRAIN master-param dtype: "bfloat16" folds the f32 master copy (params
    # + adam moments in bf16) — ~15% fewer weight-side HBM bytes per step
    # (PERF.md byte attribution) at an update-precision cost; default keeps
    # f32 masters (the mixed-precision policy quality tests pin)
    cfg.master_dtype = "float32"
    # host->device batch transfer dtype for TRAINING: "bfloat16" halves the
    # bytes pushed over the host->device link per step (float arrays only;
    # the train step upcasts at entry, so only the f32->bf16 input rounding
    # differs). Eval/quality paths always transfer f32.
    cfg.transfer_dtype = "float32"
    cfg.msda_backend = ""  # '' = auto (matmul on TPU, gather on CPU)
    # K optimizer steps per host dispatch (lax.scan inside one XLA program);
    # amortizes per-step host round-trips (engine/train.py multi-step)
    cfg.steps_per_dispatch = 1
    # exit (status 75, post-checkpoint, epoch boundary) when host RSS exceeds
    # this many GB; 0 (default) disables. Opt-in mitigation for the axon
    # tunnel client's per-dispatch host leak (COMPONENTS.md) — pair with a
    # resume wrapper (relaunch --resume until "Training done").
    cfg.rss_restart_gb = 0

    # -- mesh / parallelism ----------------------------------------------------
    cfg.mesh = ml_collections.ConfigDict()
    cfg.mesh.data_axis = "data"
    cfg.mesh.model_axis = "model"
    cfg.mesh.num_data = -1   # -1 = all devices on the data axis
    cfg.mesh.num_model = 1

    # -- dataset ---------------------------------------------------------------
    cfg.dataset = ml_collections.ConfigDict()
    anet = cfg.dataset.activity_net = ml_collections.ConfigDict()
    anet.anet_path = _default_anet_path()
    anet.video_features_file = ""      # h5 file of (num_tokens, feature_dim)
    anet.audio_features_file = ""      # audio h5; empty = alias the video h5
                                       # (reference dataset/anet.py:72 quirk)
    anet.invalid_videos_json = ""
    anet.for_testing = False
    anet.num_samples = 6
    anet.vocab_file_path = "./vocab.pkl"
    anet.min_freq = 2
    anet.max_caption_len_all = 20
    anet.video_rescale_len = 300
    anet.audio_rescale_len = 50
    anet.num_mel_bins = 128
    anet.audio_target_length = 64
    anet.max_gt_target_segments = 10
    anet.num_classes = 200
    anet.val_subset = 0   # >0: deterministic sorted val subset (fast in-train eval)
    anet.train_subset = 0  # >0: deterministic sorted train subset (short runs)
    anet.raw_video_folder = ""
    anet.raw_audio_folder = ""   # optional wav sidecars for the opencv decoder

    # -- DVC model ---------------------------------------------------------------
    dvc = cfg.dvc = ml_collections.ConfigDict()
    dvc.input_modalities = ["video"]
    # BiModalEncoder fusion ahead of the multimodal proposal stack (the
    # reference ships the module unwired, regular/dvc.py:55 TODO)
    dvc.use_bimodal_encoder = False
    dvc.bimodal_depth = 2
    dvc.num_queries = 20
    dvc.d_model = 512
    dvc.aux_loss = True
    dvc.num_classes = 200
    dvc.threshold = 0.5
    dvc.max_eseq_length = 10
    dvc.lloss_gau_mask = 1
    dvc.lloss_beta = 1.0

    dvc.use_sparse_detr = True
    dvc.use_deformable_detr = False

    dvc.smoothing = 0.5  # caption label smoothing epsilon

    dvc.cls_loss_coef = 1.0
    dvc.counter_loss_coef = 2.0
    dvc.bbox_loss_coef = 5.0
    dvc.giou_loss_coef = 2.0
    dvc.self_iou_loss_coef = 2.0
    dvc.caption_loss_coef = 1.0
    dvc.context_loss_coef = 3.0
    dvc.mask_prediction_coef = 2.0
    dvc.corr_coef = 2.0
    dvc.eos_coef = 0.1

    # 'contexts' / 'mask_prediction' appended per flags below, mirroring
    # config_dvc_train.py:152-159
    dvc.losses = ["labels", "segments", "captions"]
    if cfg.use_differentiable_mask:
        dvc.losses.append("contexts")
    if dvc.use_sparse_detr:
        dvc.losses.append("mask_prediction")

    # matcher
    m = dvc.matcher = ml_collections.ConfigDict()
    m.cost_class = 1.0
    m.cost_segment = 5.0
    m.cost_giou = 2.0
    m.cost_alpha = 0.25
    m.cost_gamma = 2.0

    # proposal transformer (shared by deformable + sparse families)
    det = dvc.detr = ml_collections.ConfigDict()
    det.feature_dim = dvc.d_model
    det.d_model = dvc.d_model
    det.num_heads = 8
    det.num_feature_levels = 4
    det.dec_n_points = 4
    det.enc_n_points = 4
    det.enc_layers = 6
    det.dec_layers = 6
    det.transformer_dropout_prob = 0.1
    det.transformer_ff_dim = 2048
    det.video_rescale_len = anet.video_rescale_len
    det.return_intermediate = True
    # sparse-DETR extras (ignored by the dense family)
    det.rho = 0.5
    det.use_enc_aux_loss = True

    # caption decoder
    cap = dvc.caption = ml_collections.ConfigDict()
    cap.d_model = dvc.d_model
    cap.depth = 6
    cap.num_heads = 8
    cap.mlp_ratio = 4
    cap.qkv_bias = True
    cap.positional_embedding_dropout = 0.1
    cap.attention_dropout = 0.1
    cap.projection_dropout = 0.1
    cap.bridge_dropout = 0.1
    cap.mlp_dropout_1 = 0.1
    cap.mlp_dropout_2 = 0.1
    cap.pre_norm = False
    cap.emb_weights_req_grad = True
    cap.return_intermediate = True
    cap.pretrained_word_embed_dim = 300
    cap.glove_file_path = ""
    cap.embedding_matrix_file_path = "embedding_matrix.pkl"

    # regular (non-deformable) decoder + ViViT/AST backbones
    dec = dvc.decoder = ml_collections.ConfigDict()
    dec.d_model = dvc.d_model
    dec.depth = 6
    dec.num_heads = 8
    dec.mlp_ratio = 4
    dec.qkv_bias = True

    viv = dvc.vivit = ml_collections.ConfigDict()
    viv.model_name = "factorised encoder"
    viv.depth = 12
    viv.temporal_depth = 4
    viv.num_heads = 12
    viv.spatial_patch_size = 16
    viv.temporal_patch_size = 1

    ast = dvc.ast = ml_collections.ConfigDict()
    ast.depth = 12
    ast.num_heads = 12
    ast.patch_size = 16
    ast.frequency_stride = 10
    ast.time_stride = 10

    # eval
    ev = cfg.eval = ml_collections.ConfigDict()
    ev.tious = [0.3, 0.5, 0.7, 0.9]
    ev.max_proposals_per_video = 100
    ev.distances = []
    ev.verbose = False
    # decode configuration (reference exposes faster_eval at the model API,
    # unimodal_sparse_dvc.py:111; beam search is a TPU-native extension)
    ev.val_mode = "one_by_one"   # one_by_one | teacher_forcing | beam
    # NOTE: faster_eval is a SEMANTIC flag (raw argmax fills every caption
    # slot, reference :334-335), NOT a speedup here — it must run all
    # seq_len steps and so forfeits greedy's all-done early exit (README)
    ev.faster_eval = False
    ev.beam_size = 4
    ev.length_penalty = 0.0

    # wandb-style run metadata (logging only)
    cfg.wandb = ml_collections.ConfigDict()
    cfg.wandb.on = False
    cfg.wandb.project = "mfl-tpu"

    return cfg


def load_config_test() -> ml_collections.ConfigDict:
    cfg = load_config_train()
    cfg.model_mode = "validation"
    cfg.dataset.activity_net.for_testing = True
    return cfg


def load_config(mode: str = "train") -> ml_collections.ConfigDict:
    return load_config_train() if mode == "train" else load_config_test()


def recompute_losses(cfg) -> None:
    """Re-derive cfg.dvc.losses from the family/mask flags — call after any
    config overrides so flag flips keep the loss list consistent
    (reference config_dvc_train.py:152-159 builds it from the same flags)."""
    losses = ["labels", "segments", "captions"]
    if cfg.use_differentiable_mask:
        losses.append("contexts")
    if cfg.dvc.use_sparse_detr:
        losses.append("mask_prediction")
    cfg.dvc.losses = losses
