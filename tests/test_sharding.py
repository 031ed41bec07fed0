"""Mesh-sharding correctness: data-parallel and token-axis (SP) sharded runs
must reproduce the single-layout results on the virtual 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from tests.test_model_forward import PAD, BOS, EOS, VOCAB, small_cfg, synthetic_batch
from multimodal_feature_learning_tpu.models.dvc import build_model
from multimodal_feature_learning_tpu.parallel.mesh import make_mesh, replicate_params

pytestmark = pytest.mark.slow  # heavy full-model/e2e (run with -m 'slow or not slow')


def test_data_parallel_matches_single_device():
    cfg = small_cfg()
    model = build_model(cfg, VOCAB, PAD, BOS, EOS)
    batch = synthetic_batch(cfg, B=8)
    params = model.init(jax.random.PRNGKey(0), batch)

    f = jax.jit(lambda p, b: model.forward_eval(p, b, "teacher_forcing")[0]["pred_segments"])
    base = np.asarray(f(params, batch))

    mesh = make_mesh(num_data=8)
    params_r = replicate_params(params, mesh)
    sharded = {k: jax.device_put(v, NamedSharding(mesh, P("data"))) for k, v in batch.items()}
    out = np.asarray(f(params_r, sharded))
    np.testing.assert_allclose(out, base, rtol=1e-4, atol=1e-5)


def test_token_axis_sharding_matches():
    """SP demo: encoder memory constrained onto the 'model' axis (2 data x 4
    model); outputs must match the unsharded run."""
    cfg = small_cfg()
    base_model = build_model(cfg, VOCAB, PAD, BOS, EOS)
    batch = synthetic_batch(cfg, B=2)
    params = base_model.init(jax.random.PRNGKey(0), batch)
    f_base = jax.jit(
        lambda p, b: base_model.forward_eval(p, b, "teacher_forcing")[0]["pred_count"]
    )
    base = np.asarray(f_base(params, batch))

    # same model with the token-sharding constraint (no extra params)
    model = build_model(cfg, VOCAB, PAD, BOS, EOS)
    object.__setattr__(
        model, "proposal_net", model.proposal_net.clone(shard_tokens_axis="model")
    )
    mesh = make_mesh(num_data=2, num_model=4)
    with jax.set_mesh(mesh):
        params_r = replicate_params(params, mesh)
        sharded = {
            k: jax.device_put(v, NamedSharding(mesh, P("data")))
            for k, v in batch.items()
        }
        f = jax.jit(
            lambda p, b: model.forward_eval(p, b, "teacher_forcing")[0]["pred_count"]
        )
        out = np.asarray(f(params_r, sharded))
    np.testing.assert_allclose(out, base, rtol=1e-4, atol=1e-5)

def test_dp_sp_train_step_matches_single_device():
    """One full training step on a 2-D mesh (4 data x 2 model, encoder memory
    token-axis sharded over 'model' — the layout __graft_entry__.dryrun_multichip
    validates) must produce the same loss and updated params as the unsharded
    single-device step."""
    from multimodal_feature_learning_tpu.engine.state import (
        create_train_state,
        make_optimizer,
    )
    from multimodal_feature_learning_tpu.engine.train import make_train_step
    from multimodal_feature_learning_tpu.models.criterion import (
        SetCriterion,
        build_weight_dict,
    )

    cfg = small_cfg()
    model = build_model(cfg, VOCAB, PAD, BOS, EOS)
    batch = synthetic_batch(cfg, B=8)
    params = model.init(jax.random.PRNGKey(0), batch)

    weight_dict = build_weight_dict(cfg)
    criterion = SetCriterion(
        num_classes=cfg.dvc.num_classes, weight_dict=weight_dict,
        losses=["labels", "segments", "captions", "contexts", "mask_prediction"],
        pad_idx=PAD, smoothing=cfg.dvc.smoothing,
    )
    tx = make_optimizer(cfg, steps_per_epoch=10)
    rng = jax.random.PRNGKey(1)

    # single-device reference step (copy: the step donates its state)
    state = create_train_state(jax.tree.map(jnp.copy, params), tx)
    step = make_train_step(model, criterion, weight_dict, tx)
    state1, metrics1, _ = step(state, batch, rng)
    base_loss = float(metrics1["loss"])
    base_params = jax.device_get(state1.params)

    # DP x SP sharded step
    sp_model = build_model(cfg, VOCAB, PAD, BOS, EOS)
    object.__setattr__(
        sp_model, "proposal_net",
        sp_model.proposal_net.clone(shard_tokens_axis="model"),
    )
    mesh = make_mesh(num_data=4, num_model=2)
    with jax.set_mesh(mesh):
        params_r = replicate_params(jax.tree.map(jnp.copy, params), mesh)
        sharded = {
            k: jax.device_put(v, NamedSharding(mesh, P("data")))
            for k, v in batch.items()
        }
        state_r = create_train_state(params_r, tx)
        step_sp = make_train_step(sp_model, criterion, weight_dict, tx)
        state2, metrics2, _ = step_sp(state_r, sharded, rng)
        sp_loss = float(metrics2["loss"])
        sp_params = jax.device_get(state2.params)

    np.testing.assert_allclose(sp_loss, base_loss, rtol=1e-5)
    flat1 = jax.tree_util.tree_leaves(base_params)
    flat2 = jax.tree_util.tree_leaves(sp_params)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-5)


def test_tp_param_sharding_eval_matches():
    """Megatron-style TP (FFN column/row pairs, attention q/k/v/out, caption
    vocab head sharded over 'model') must reproduce the replicated eval
    outputs bit-for-tolerance; GSPMD inserts the collectives."""
    from multimodal_feature_learning_tpu.parallel.tp import (
        shard_params_tp, tp_param_specs,
    )

    cfg = small_cfg()
    model = build_model(cfg, VOCAB, PAD, BOS, EOS)
    batch = synthetic_batch(cfg, B=4)
    params = model.init(jax.random.PRNGKey(0), batch)

    f = jax.jit(lambda p, b: model.forward_eval(p, b, "teacher_forcing")[0])
    base = f(params, batch)

    # the rules must actually shard something nontrivial
    specs = tp_param_specs(params)
    n_sharded = sum(
        1 for s in jax.tree_util.tree_leaves(
            specs, is_leaf=lambda x: isinstance(x, P))
        if s != P())
    assert n_sharded >= 10

    mesh = make_mesh(num_data=2, num_model=4)
    with jax.set_mesh(mesh):
        params_tp = shard_params_tp(params, mesh)
        sharded = {
            k: jax.device_put(v, NamedSharding(mesh, P("data")))
            for k, v in batch.items()
        }
        out = f(params_tp, sharded)
    for key in ("pred_segments", "pred_count", "pred_captions"):
        np.testing.assert_allclose(
            np.asarray(out[key]), np.asarray(base[key]), rtol=1e-4, atol=1e-5)


def test_dp_tp_sp_train_step_matches_single_device():
    """Full 3-way composition on one 2-D mesh (4 data x 2 model; TP param
    sharding + token-axis SP both riding the 'model' axis): one training step
    must produce the same loss and updated params as the unsharded
    single-device step. This is the layout dryrun_multichip exercises."""
    from multimodal_feature_learning_tpu.engine.state import (
        create_train_state,
        make_optimizer,
    )
    from multimodal_feature_learning_tpu.engine.train import make_train_step
    from multimodal_feature_learning_tpu.models.criterion import (
        SetCriterion,
        build_weight_dict,
    )
    from multimodal_feature_learning_tpu.parallel.tp import shard_params_tp

    cfg = small_cfg()
    model = build_model(cfg, VOCAB, PAD, BOS, EOS)
    batch = synthetic_batch(cfg, B=8)
    params = model.init(jax.random.PRNGKey(0), batch)

    weight_dict = build_weight_dict(cfg)
    criterion = SetCriterion(
        num_classes=cfg.dvc.num_classes, weight_dict=weight_dict,
        losses=["labels", "segments", "captions", "contexts", "mask_prediction"],
        pad_idx=PAD, smoothing=cfg.dvc.smoothing,
    )
    tx = make_optimizer(cfg, steps_per_epoch=10)
    rng = jax.random.PRNGKey(1)

    state = create_train_state(jax.tree.map(jnp.copy, params), tx)
    step = make_train_step(model, criterion, weight_dict, tx)
    state1, metrics1, _ = step(state, batch, rng)
    base_loss = float(metrics1["loss"])
    base_params = jax.device_get(state1.params)

    tp_model = build_model(cfg, VOCAB, PAD, BOS, EOS)
    object.__setattr__(
        tp_model, "proposal_net",
        tp_model.proposal_net.clone(shard_tokens_axis="model"),
    )
    mesh = make_mesh(num_data=4, num_model=2)
    with jax.set_mesh(mesh):
        params_tp = shard_params_tp(jax.tree.map(jnp.copy, params), mesh)
        sharded = {
            k: jax.device_put(v, NamedSharding(mesh, P("data")))
            for k, v in batch.items()
        }
        state_tp = create_train_state(params_tp, tx)
        step_tp = make_train_step(tp_model, criterion, weight_dict, tx)
        state2, metrics2, _ = step_tp(state_tp, sharded, rng)
        tp_loss = float(metrics2["loss"])
        tp_params = jax.device_get(state2.params)

    np.testing.assert_allclose(tp_loss, base_loss, rtol=1e-5)
    flat1 = jax.tree_util.tree_leaves(base_params)
    flat2 = jax.tree_util.tree_leaves(tp_params)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-5)
