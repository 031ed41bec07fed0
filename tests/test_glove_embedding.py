"""GloVe word-embedding init path (reference models/__init__.py:177-205 +
embedding_layers.py:231-261): text-file parse, unknown-word N(0,0.1) fill,
pickle cache, and the VocabularyEmbedder pretrained-init/projection variants.
"""

import numpy as np
import jax
import jax.numpy as jnp

from multimodal_feature_learning_tpu.models.embeddings import VocabularyEmbedder
from multimodal_feature_learning_tpu.models.load_weights import (
    build_word_embedding_matrix,
)


class TinyVocab:
    _itos = ["<unk>", "<pad>", "<bos>", "<eos>", "man", "dog", "xylophone"]

    def get_itos(self):
        return self._itos

    def __len__(self):
        return len(self._itos)


def write_glove(path, dim):
    vecs = {
        "man": np.arange(dim, dtype=np.float32) * 0.1,
        "dog": -np.ones(dim, dtype=np.float32),
        "unrelated": np.full(dim, 9.0, dtype=np.float32),
    }
    with open(path, "w") as f:
        for w, v in vecs.items():
            f.write(w + " " + " ".join(f"{x:.6f}" for x in v) + "\n")
    return vecs


def test_build_matrix_known_unknown_and_cache(tmp_path):
    dim = 8
    glove = tmp_path / "glove.txt"
    vecs = write_glove(glove, dim)
    vocab = TinyVocab()
    cache = tmp_path / "emb.pkl"

    mat = build_word_embedding_matrix(str(glove), vocab, dim, cache_path=str(cache))
    assert mat.shape == (len(vocab), dim) and mat.dtype == np.float32
    np.testing.assert_array_equal(mat[4], vecs["man"])
    np.testing.assert_array_equal(mat[5], vecs["dog"])
    # unknown words get the seeded N(0, 0.1) fill, not zeros / glove rows
    rng = np.random.default_rng(0)
    expect = rng.normal(0, 0.1, (len(vocab), dim)).astype(np.float32)
    np.testing.assert_array_equal(mat[6], expect[6])

    # second call must come from the pickle cache: glove file is gone
    glove.unlink()
    mat2 = build_word_embedding_matrix(str(glove), vocab, dim, cache_path=str(cache))
    np.testing.assert_array_equal(mat2, mat)


def test_vocabulary_embedder_pretrained_same_dim():
    d = 8
    vocab = TinyVocab()
    mat = np.random.default_rng(1).normal(size=(len(vocab), d)).astype(np.float32)
    emb = VocabularyEmbedder(len(vocab), d, pretrained_matrix=mat)
    tokens = jnp.asarray([[4, 5, 0]])
    params = emb.init(jax.random.PRNGKey(0), tokens)
    out = emb.apply(params, tokens)
    # reference embedding_layers.py:231-261: glove row x sqrt(d_model)
    np.testing.assert_allclose(
        np.asarray(out[0]), mat[[4, 5, 0]] * np.sqrt(d), rtol=1e-6)


def test_vocabulary_embedder_projection_when_dims_differ():
    d, pre = 8, 6
    vocab = TinyVocab()
    mat = np.random.default_rng(2).normal(size=(len(vocab), pre)).astype(np.float32)
    emb = VocabularyEmbedder(len(vocab), d, pretrained_matrix=mat)
    tokens = jnp.asarray([[1, 2, 3, 4]])
    params = emb.init(jax.random.PRNGKey(0), tokens)
    out = emb.apply(params, tokens)
    assert out.shape == (1, 4, d)
    assert np.all(np.isfinite(np.asarray(out)))
    # pretrained table itself must be the init of the Embed layer
    table = jax.tree_util.tree_leaves(
        {k: v for k, v in params["params"].items() if "Embed" in k})[0]
    np.testing.assert_array_equal(np.asarray(table), mat)
