"""Model layer: flax.linen modules + orchestrators for the DVC families.

``build_model_and_criterion`` mirrors the reference builder
(models/__init__.py:17-173): family picked by config flags
(use_sparse_detr / use_deformable_detr x input modalities, else the regular
vanilla-attention family), GloVe embedding matrix optional, weight_dict with
aux/caption/enc-aux suffixes, SetCriterion over cfg.dvc.losses.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def build_model_and_criterion(cfg, vocab, embedding_matrix: Optional[np.ndarray] = None):
    from .criterion import SetCriterion, build_weight_dict
    from .dvc import build_model as build_unimodal
    from .multimodal import build_multimodal_model
    from .regular_dvc import build_regular_model

    if embedding_matrix is None and cfg.dvc.caption.glove_file_path:
        if os.path.exists(cfg.dvc.caption.glove_file_path):
            from .load_weights import build_word_embedding_matrix

            embedding_matrix = build_word_embedding_matrix(
                cfg.dvc.caption.glove_file_path, vocab,
                cfg.dvc.caption.pretrained_word_embed_dim,
                cache_path=cfg.dvc.caption.embedding_matrix_file_path,
            )

    multimodal = len(cfg.dvc.input_modalities) == 2
    args = (cfg, len(vocab), vocab.pad_idx, vocab.bos_idx, vocab.eos_idx, embedding_matrix)
    if cfg.dvc.use_sparse_detr or cfg.dvc.use_deformable_detr:
        model = build_multimodal_model(*args) if multimodal else build_unimodal(*args)
    else:
        model = build_regular_model(*args)

    weight_dict = build_weight_dict(cfg)
    criterion = SetCriterion(
        num_classes=cfg.dvc.num_classes,
        weight_dict=weight_dict,
        losses=list(cfg.dvc.losses),
        pad_idx=vocab.pad_idx,
        smoothing=cfg.dvc.smoothing,
        eos_coef=cfg.dvc.eos_coef,
        lloss_gau_mask=cfg.dvc.lloss_gau_mask,
        lloss_beta=cfg.dvc.lloss_beta,
    )
    return model, criterion, weight_dict
