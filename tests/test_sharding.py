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