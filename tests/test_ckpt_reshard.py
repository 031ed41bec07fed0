"""Checkpoint portability across mesh shapes (VERDICT r3 item 3).

A checkpoint written under one topology must resume under any other — the
first thing a real multi-chip user does after a topology change. Checkpoints
are mesh-agnostic host pytrees (engine/state.py save_checkpoint device_gets
before writing); `shard_state` re-places them under the target mesh
(replicated, or TP-sharded params+moments). The criterion is loss-curve
continuation equivalence: the post-restore step under DP4xTP2 and under a
single device must produce the same loss and updated params as the
uninterrupted DP8 run.

Reference analog: resume semantics main.py:101-108 (single-topology DDP).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from tests.test_model_forward import PAD, BOS, EOS, VOCAB, small_cfg, synthetic_batch
from multimodal_feature_learning_tpu.engine.state import (
    create_train_state,
    load_checkpoint,
    make_optimizer,
    save_checkpoint,
    shard_state,
)
from multimodal_feature_learning_tpu.engine.train import make_train_step
from multimodal_feature_learning_tpu.models.criterion import (
    SetCriterion,
    build_weight_dict,
)
from multimodal_feature_learning_tpu.models.dvc import build_model
from multimodal_feature_learning_tpu.parallel.mesh import make_mesh
from multimodal_feature_learning_tpu.parallel.tp import shard_params_tp

pytestmark = pytest.mark.slow  # heavy full-model/e2e (run with -m 'slow or not slow')


def _setup():
    cfg = small_cfg()
    model = build_model(cfg, VOCAB, PAD, BOS, EOS)
    weight_dict = build_weight_dict(cfg)
    criterion = SetCriterion(
        num_classes=cfg.dvc.num_classes, weight_dict=weight_dict,
        losses=["labels", "segments", "captions", "contexts", "mask_prediction"],
        pad_idx=PAD, smoothing=cfg.dvc.smoothing,
    )
    tx = make_optimizer(cfg, steps_per_epoch=10)
    step = make_train_step(model, criterion, weight_dict, tx)
    return cfg, model, tx, step


def _shard_batch_dp(batch, mesh):
    return {k: jax.device_put(v, NamedSharding(mesh, P("data")))
            for k, v in batch.items()}


def test_save_dp8_restore_dp4xtp2_and_single_device(tmp_path):
    cfg, model, tx, step = _setup()
    batches = [synthetic_batch(cfg, B=8, seed=s) for s in (0, 1, 2)]
    rngs = [jax.random.PRNGKey(10 + i) for i in range(3)]

    # -- train 2 steps under DP8, checkpoint, take the reference 3rd step ----
    mesh8 = make_mesh(num_data=8)
    params = model.init(jax.random.PRNGKey(0), batches[0])
    with jax.set_mesh(mesh8):
        state = shard_state(create_train_state(params, tx), mesh8)
        for i in range(2):
            state, _, _ = step(state, _shard_batch_dp(batches[i], mesh8), rngs[i])
        path = save_checkpoint(str(tmp_path), state, epoch=2)
        host_template = jax.device_get(state)
        state_ref, metrics_ref, _ = step(
            state, _shard_batch_dp(batches[2], mesh8), rngs[2])
        loss_ref = float(metrics_ref["loss"])
        params_ref = jax.device_get(state_ref.params)

    restored = load_checkpoint(path, abstract_state=host_template)
    assert restored["epoch"] == 2

    # -- resume under DP4 x TP2 (params AND adam moments TP-sharded) --------
    mesh42 = make_mesh(num_data=4, num_model=2)
    with jax.set_mesh(mesh42):
        state_tp = shard_state(restored["state"], mesh42, tp_axis="model")
        # the moments really are sharded, not just the params
        mu_shardings = {
            str(s) for s in jax.tree_util.tree_leaves(
                jax.tree.map(lambda a: a.sharding.spec, state_tp.opt_state))
        }
        assert any("model" in s for s in mu_shardings), mu_shardings
        state_tp2, metrics_tp, _ = step(
            state_tp, _shard_batch_dp(batches[2], mesh42), rngs[2])
        np.testing.assert_allclose(
            float(metrics_tp["loss"]), loss_ref, rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(params_ref),
                        jax.tree_util.tree_leaves(jax.device_get(state_tp2.params))):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=2e-4, atol=2e-5)

    # -- resume under a single device ---------------------------------------
    restored1 = load_checkpoint(path, abstract_state=host_template)
    mesh1 = make_mesh(num_data=1, devices=jax.devices()[:1])
    state_1 = shard_state(restored1["state"], mesh1)
    state_1b, metrics_1, _ = step(state_1, batches[2], rngs[2])
    np.testing.assert_allclose(float(metrics_1["loss"]), loss_ref, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(params_ref),
                    jax.tree_util.tree_leaves(jax.device_get(state_1b.params))):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-5)


def test_save_tp_restore_dp(tmp_path):
    """The reverse direction: a checkpoint written under DP4xTP2 (sharded
    arrays on disk via device_get) restores and continues under pure DP8."""
    cfg, model, tx, step = _setup()
    batch0 = synthetic_batch(cfg, B=8, seed=0)
    batch1 = synthetic_batch(cfg, B=8, seed=1)
    rng0, rng1 = jax.random.PRNGKey(10), jax.random.PRNGKey(11)

    params = model.init(jax.random.PRNGKey(0), batch0)
    mesh42 = make_mesh(num_data=4, num_model=2)
    with jax.set_mesh(mesh42):
        params_tp = shard_params_tp(params, mesh42)
        state = create_train_state(params_tp, tx)
        state, _, _ = step(state, _shard_batch_dp(batch0, mesh42), rng0)
        path = save_checkpoint(str(tmp_path), state, epoch=1)
        host_template = jax.device_get(state)
        state_ref, metrics_ref, _ = step(
            state, _shard_batch_dp(batch1, mesh42), rng1)
        loss_ref = float(metrics_ref["loss"])

    restored = load_checkpoint(path, abstract_state=host_template)
    mesh8 = make_mesh(num_data=8)
    with jax.set_mesh(mesh8):
        state_dp = shard_state(restored["state"], mesh8)
        _, metrics_dp, _ = step(state_dp, _shard_batch_dp(batch1, mesh8), rng1)
        np.testing.assert_allclose(float(metrics_dp["loss"]), loss_ref, rtol=1e-5)
