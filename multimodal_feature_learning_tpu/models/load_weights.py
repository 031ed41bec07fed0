"""Pretrained-weight surgery and embedding-matrix construction.

Behavioral spec: reference ``models/load_weights.py`` (timm ViT/DeiT ->
ViViT/AST transplants: tubelet kernel inflation / central-frame init
:33-66, positional-embedding repetition/interpolation :70-99) and
``models/__init__.py:177-205`` (GloVe -> vocab embedding matrix).

Everything operates on plain numpy weight dicts, so a timm/torch checkpoint
exported to npz can be transplanted without torch at runtime.
"""

from __future__ import annotations

import pickle
from typing import Dict, Optional

import numpy as np


def build_word_embedding_matrix(
    glove_file_path: str, vocab, pretrained_word_embed_dim: int,
    cache_path: str = "", seed: int = 0,
) -> np.ndarray:
    """(vocab_size, dim) matrix: GloVe vector where known, N(0, 0.1) otherwise.
    Reference models/__init__.py:177-205 (with a pickle cache like :33-45)."""
    if cache_path:
        try:
            with open(cache_path, "rb") as f:
                mat = pickle.load(f)
            if mat.shape == (len(vocab), pretrained_word_embed_dim):
                return mat
        except (OSError, pickle.PickleError):
            pass

    embedding_index = {}
    with open(glove_file_path) as f:
        for line in f:
            data = line.rstrip("\n").split(" ")
            embedding_index[data[0]] = np.asarray(data[1:], dtype=np.float32)

    rng = np.random.default_rng(seed)
    matrix = rng.normal(0, 0.1, (len(vocab), pretrained_word_embed_dim)).astype(np.float32)
    for i, word in enumerate(vocab.get_itos()):
        vec = embedding_index.get(word)
        if vec is not None:
            matrix[i] = vec
    if cache_path:
        with open(cache_path, "wb") as f:
            pickle.dump(matrix, f)
    return matrix


def inflate_patch_kernel_to_tubelet(
    patch_kernel: np.ndarray,   # ViT Conv2d weight, torch layout (D, C, ph, pw)
    temporal_patch_size: int,
    method: str = "central frame",
) -> np.ndarray:
    """2-D patch kernel -> 3-D tubelet kernel, flax layout (pt, ph, pw, C, D).

    'central frame': zeros except the central temporal slice; 'filter
    inflation': repeat / pt. Reference load_weights.py:48-57."""
    D, C, ph, pw = patch_kernel.shape
    k2 = patch_kernel.transpose(2, 3, 1, 0)  # (ph, pw, C, D), flax layout
    pt = temporal_patch_size
    out = np.zeros((pt, ph, pw, C, D), dtype=patch_kernel.dtype)
    if pt == 1:
        out[0] = k2
    elif method == "filter inflation":
        out[:] = k2[None] / pt
    elif method == "central frame":
        out[pt // 2] = k2
    else:
        raise ValueError(f"unknown tokenization method {method!r}")
    return out


def repeat_pos_embed_for_frames(
    pos_embed: np.ndarray,  # (1, P+1, D) ViT positional embedding (cls first)
    num_frames: int,
) -> np.ndarray:
    """(1, num_frames * P + 1, D): cls slot kept, patch slots tiled per frame
    (reference load_weights.py:83-99, 'spatio temporal attention' case)."""
    cls_slot = pos_embed[:, :1]
    patches = np.tile(pos_embed[:, 1:], (1, num_frames, 1))
    return np.concatenate([cls_slot, patches], axis=1)


def interpolate_pos_embed(
    pos_embed: np.ndarray,  # (1, n_in, D)
    n_out: int,
) -> np.ndarray:
    """Linear interpolation of positional-embedding rows to a new token count
    (the AST pos-embed cut/interp surgery, reference models/regular/ast.py)."""
    n_in, D = pos_embed.shape[1], pos_embed.shape[2]
    if n_in == n_out:
        return pos_embed
    x_out = np.linspace(0, n_in - 1, n_out)
    x_in = np.arange(n_in)
    out = np.stack(
        [np.interp(x_out, x_in, pos_embed[0, :, d]) for d in range(D)], axis=1
    )
    return out[None].astype(pos_embed.dtype)


def transplant_vit_to_vivit(
    vit_npz: Dict[str, np.ndarray],
    vivit_params: Dict,
    num_frames: int,
    temporal_patch_size: int = 1,
    tokenization_method: str = "central frame",
    model_name: str = "factorised encoder",
) -> Dict:
    """Transplant a ViT checkpoint (npz with torch-layout arrays
    'patch_embed.proj.weight/bias', 'pos_embed') into a ViViT params pytree.
    Returns the updated (copied) pytree; encoder blocks keep their init (the
    reference loads those too only when architecture dims match)."""
    import jax

    # np.array(copy=True): np.asarray of a jax.Array yields a READ-ONLY view,
    # which breaks the in-place pos-embed surgery below
    params = jax.tree_util.tree_map(lambda a: np.array(a), vivit_params)
    p = params["params"]
    tok = p["token_embeddings_layer"]["project_to_patch"]
    tok["kernel"] = inflate_patch_kernel_to_tubelet(
        vit_npz["patch_embed.proj.weight"], temporal_patch_size, tokenization_method
    )
    tok["bias"] = vit_npz["patch_embed.proj.bias"]

    pos = vit_npz["pos_embed"]  # (1, P+1, D)
    if model_name == "spatio temporal attention":
        new_pos = repeat_pos_embed_for_frames(pos, num_frames)
        n = min(new_pos.shape[1], p["pos_embedding"].shape[1])
        p["pos_embedding"][:, :n] = new_pos[:, :n]
    elif model_name == "factorised encoder":
        n = min(pos.shape[1], p["spatial_pos_embedding"].shape[1])
        p["spatial_pos_embedding"][:, :n] = pos[:, :n]
    return params
