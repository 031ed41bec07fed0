"""A/B the multi-step dispatch variants on the real chip: single-step vs
scan-of-8 (while loop) vs scan-of-8 unroll=8 (fully inlined). Interleaved
rounds so tunnel drift hits all variants equally."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sync(x):
    import jax

    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[0]))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/mfl_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from __graft_entry__ import _flagship_cfg
    from bench import real_batches, real_vocab_size
    from multimodal_feature_learning_tpu.engine.state import (
        create_train_state, make_optimizer,
    )
    from multimodal_feature_learning_tpu.engine.train import (
        make_train_multistep, make_train_step,
    )
    from multimodal_feature_learning_tpu.models.criterion import (
        SetCriterion, build_weight_dict,
    )
    from multimodal_feature_learning_tpu.models.dvc import build_model

    BATCH, K = 16, 8
    cfg = _flagship_cfg(batch_size=BATCH)
    vocab_size = real_vocab_size()
    model = build_model(cfg, vocab_size)
    batches = real_batches(cfg, vocab_size, n_batches=K)
    stacked = {k: np.stack([np.asarray(b[k]) for b in batches])
               for k in batches[0]}
    weight_dict = build_weight_dict(cfg)
    criterion = SetCriterion(
        num_classes=cfg.dvc.num_classes, weight_dict=weight_dict,
        losses=list(cfg.dvc.losses), pad_idx=1, smoothing=cfg.dvc.smoothing,
    )
    tx = make_optimizer(cfg, steps_per_epoch=100)
    rng = jax.random.PRNGKey(1)

    def mk_state():
        return create_train_state(model.init(jax.random.PRNGKey(0), batches[0]), tx)

    single = make_train_step(model, criterion, weight_dict, tx)
    multi = make_train_multistep(model, criterion, weight_dict, tx)
    multi_u = make_train_multistep(model, criterion, weight_dict, tx, unroll=K)

    def run_single(st, n=K):
        for i in range(n):
            st, m, _ = single(st, batches[i % K], rng)
        return st, m

    def run_multi(fn, st):
        st, mk, _ = fn(st, stacked, rng)
        return st, mk

    variants = [
        ("single x8", run_single, mk_state()),
        ("scan k8", lambda st: run_multi(multi, st), mk_state()),
        ("scan k8 unroll=8", lambda st: run_multi(multi_u, st), mk_state()),
    ]
    # compile
    compiled = []
    for name, fn, st in variants:
        t0 = time.perf_counter()
        st, m = fn(st)
        _sync(m)
        print(f"# compiled {name} in {time.perf_counter() - t0:.0f}s",
              file=sys.stderr, flush=True)
        compiled.append((name, fn, st))

    ROUNDS = 6
    times = {n: [] for n, *_ in compiled}
    states = {n: st for n, _, st in compiled}  # donation: thread states through
    for r in range(ROUNDS):
        for name, fn, _ in compiled:
            st = states[name]
            t0 = time.perf_counter()
            st, m = fn(st)
            st, m = fn(st)
            _sync(m)
            times[name].append((time.perf_counter() - t0) / (2 * K) * 1e3)
            states[name] = st

    print("| variant | median ms/step | min | rounds |")
    print("|---|---|---|---|")
    for name, *_ in compiled:
        t = sorted(times[name])
        print(f"| {name} | {t[len(t) // 2]:.1f} | {t[0]:.1f} | "
              + ",".join(f"{x:.0f}" for x in times[name]) + " |")


if __name__ == "__main__":
    main()
