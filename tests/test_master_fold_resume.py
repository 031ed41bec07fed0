"""Cross-master-dtype checkpoint resume (ADVICE r4).

cfg.master_dtype may legitimately change between save and resume (a run
trained with f32 masters resumed with the bf16 fold on, or vice versa).
engine/state.py::load_checkpoint must not fail on the mismatched restore
template: it retries with the flipped-master template and casts onto the
requested dtypes — the fold (or unfold) applies after restore.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from multimodal_feature_learning_tpu.engine.state import (
    create_train_state,
    load_checkpoint,
    save_checkpoint,
)


def _tiny_state(master_dtype=None):
    params = {
        "w": jnp.arange(12, dtype=jnp.float32).reshape(3, 4) / 7.0,
        "b": jnp.ones((4,), jnp.float32),
        "steps": jnp.array(3, jnp.int32),  # non-float leaf must pass through
    }
    tx = optax.adamw(1e-3)
    return create_train_state(params, tx, master_dtype=master_dtype), tx


def test_resume_f32_checkpoint_with_bf16_fold(tmp_path):
    state32, tx = _tiny_state()
    path = save_checkpoint(str(tmp_path), state32, epoch=5)

    template16, _ = _tiny_state(master_dtype="bfloat16")
    restored = load_checkpoint(path, abstract_state=jax.device_get(template16))
    assert restored["epoch"] == 5
    p = restored["state"].params
    assert p["w"].dtype == jnp.bfloat16
    assert p["steps"].dtype == jnp.int32
    np.testing.assert_allclose(
        np.asarray(p["w"], np.float32),
        np.asarray(state32.params["w"]).astype(jnp.bfloat16).astype(np.float32),
    )


def test_resume_bf16_checkpoint_with_f32_masters(tmp_path):
    state16, tx = _tiny_state(master_dtype="bfloat16")
    path = save_checkpoint(str(tmp_path), state16, epoch=2)

    template32, _ = _tiny_state()
    restored = load_checkpoint(path, abstract_state=jax.device_get(template32))
    assert restored["epoch"] == 2
    p = restored["state"].params
    assert p["w"].dtype == jnp.float32
    # values carry bf16 precision (that's what was saved), upcast losslessly
    np.testing.assert_allclose(
        np.asarray(p["w"]),
        np.asarray(state16.params["w"]).astype(np.float32),
    )


def test_matched_template_still_exact(tmp_path):
    state32, _ = _tiny_state()
    path = save_checkpoint(str(tmp_path), state32, epoch=1)
    restored = load_checkpoint(path, abstract_state=jax.device_get(state32))
    np.testing.assert_array_equal(
        np.asarray(restored["state"].params["w"]),
        np.asarray(state32.params["w"]),
    )
