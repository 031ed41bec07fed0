"""Multi-step dispatch equivalence: one lax.scan-of-K program must produce
the same optimizer trajectory as K sequential single-step dispatches
(engine/train.py::make_train_multistep)."""

import os
import sys

import numpy as np

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from __graft_entry__ import _synth_batch  # noqa: E402
from multimodal_feature_learning_tpu.engine.state import (  # noqa: E402
    create_train_state, make_optimizer,
)
from multimodal_feature_learning_tpu.engine.train import (  # noqa: E402
    make_train_multistep, make_train_step,
)
from multimodal_feature_learning_tpu.models.criterion import (  # noqa: E402
    SetCriterion, build_weight_dict,
)
from multimodal_feature_learning_tpu.models.dvc import build_model  # noqa: E402
from test_engine import small_cfg  # noqa: E402

K, B, V = 3, 8, 60


def test_multistep_matches_sequential():
    cfg = small_cfg()
    cfg.batch_size = B
    model = build_model(cfg, V)
    batches = [
        {k: np.asarray(v) for k, v in _synth_batch(cfg, B, V, seed=s).items()}
        for s in range(K)
    ]
    params = model.init(jax.random.PRNGKey(0), batches[0])

    weight_dict = build_weight_dict(cfg)
    criterion = SetCriterion(
        num_classes=cfg.dvc.num_classes, weight_dict=weight_dict,
        losses=list(cfg.dvc.losses), pad_idx=1, smoothing=cfg.dvc.smoothing,
    )
    tx = make_optimizer(cfg, steps_per_epoch=10)
    rng = jax.random.PRNGKey(7)

    # the train steps donate their state, so give each trajectory its own
    # buffer copy of the initial params
    params_b = jax.tree_util.tree_map(lambda x: x.copy(), params)
    single = make_train_step(model, criterion, weight_dict, tx)
    st_a = create_train_state(params, tx)
    metrics_seq = []
    for b in batches:
        st_a, m, _ = single(st_a, b, rng)
        metrics_seq.append(jax.device_get(m))

    multi = make_train_multistep(model, criterion, weight_dict, tx)
    st_b = create_train_state(params_b, tx)
    stacked = {k: np.stack([b[k] for b in batches]) for k in batches[0]}
    st_b, metrics_k, last_norms = multi(st_b, stacked, rng)

    assert int(st_b.step) == int(st_a.step) == K
    metrics_k = jax.device_get(metrics_k)
    for j, m_seq in enumerate(metrics_seq):
        for key, v in m_seq.items():
            np.testing.assert_allclose(
                np.asarray(metrics_k[key])[j], v, rtol=2e-5, atol=2e-6,
                err_msg=f"step {j} metric {key}",
            )
    for la, lb in zip(jax.tree_util.tree_leaves(st_a.params),
                      jax.tree_util.tree_leaves(st_b.params)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=2e-5, atol=2e-6)
    assert all(np.isfinite(x) for x in jax.tree_util.tree_leaves(
        jax.device_get(last_norms)))


def test_epoch_loop_with_chunking():
    """train_one_epoch with multi_step + ragged tail == sequential stats."""
    from multimodal_feature_learning_tpu.engine.train import train_one_epoch
    from multimodal_feature_learning_tpu.parallel.mesh import make_mesh

    cfg = small_cfg()
    cfg.batch_size = B
    model = build_model(cfg, V)
    n_batches = 5  # chunk_k=2 -> two chunks + ragged tail of 1
    raw = [
        {k: np.asarray(v) for k, v in _synth_batch(cfg, B, V, seed=s).items()}
        for s in range(n_batches)
    ]
    params = model.init(jax.random.PRNGKey(0), raw[0])
    weight_dict = build_weight_dict(cfg)
    criterion = SetCriterion(
        num_classes=cfg.dvc.num_classes, weight_dict=weight_dict,
        losses=list(cfg.dvc.losses), pad_idx=1, smoothing=cfg.dvc.smoothing,
    )
    tx = make_optimizer(cfg, steps_per_epoch=n_batches)
    rng = jax.random.PRNGKey(7)
    mesh = make_mesh()

    class ListLoader:
        def __init__(self, items):
            self.items = items

        def __iter__(self):
            return iter(self.items)

        def __len__(self):
            return len(self.items)

    loader = ListLoader(raw)  # flat array dicts: split_batch passes them through

    def run(chunk_k):
        single = make_train_step(model, criterion, weight_dict, tx)
        multi = (make_train_multistep(model, criterion, weight_dict, tx)
                 if chunk_k > 1 else None)
        # donation-safe: each run trains its own copy of the init params
        st = create_train_state(
            jax.tree_util.tree_map(lambda x: x.copy(), params), tx
        )
        st, stats = train_one_epoch(
            model, criterion, weight_dict, single, st, loader, mesh, rng,
            epoch=0, print_freq=100, multi_step=multi, chunk_k=chunk_k,
        )
        return st, stats

    st1, stats1 = run(1)
    st2, stats2 = run(2)
    assert int(st1.step) == int(st2.step) == n_batches
    # looser than the single-device equivalence above: on the 8-device SPMD
    # mesh the scan-of-K and unrolled programs fuse reductions differently
    for k in stats1:
        np.testing.assert_allclose(stats2[k], stats1[k], rtol=3e-3, atol=3e-4)
    for la, lb in zip(jax.tree_util.tree_leaves(st1.params),
                      jax.tree_util.tree_leaves(st2.params)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=3e-3, atol=3e-4)
