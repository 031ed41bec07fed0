"""Train-step cost ablation with identical program structure.

Times the full production train step against variants that stub ONE piece
(identical output signature + donation pattern, so dispatch/DCE behavior is
comparable):

  full        — production step
  no-match    — Hungarian replaced by arange-mod-Q indices
  no-aux      — aux_loss off (skips the 5 aux matchings + aux criterion)
  no-caption  — caption loss dropped from the weight dict (decoder still runs
                forward, but its backward is dead and XLA prunes it)

Ratios within one run share tunnel conditions; absolute ms varies by window.
Usage: python tools/ablate_train_step.py [--iters 16]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sync(x):
    import jax

    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[0]))


def time_step(train_step, state, batch, rng, iters):
    state, m, _ = train_step(state, batch, rng)
    _sync(m["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m, _ = train_step(state, batch, rng)
    _sync(m["loss"])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=16)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/mfl_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from __graft_entry__ import _flagship_cfg
    from bench import real_batches, real_vocab_size
    from multimodal_feature_learning_tpu.engine.state import (
        create_train_state, make_optimizer,
    )
    from multimodal_feature_learning_tpu.engine.train import make_train_step
    from multimodal_feature_learning_tpu.models import dvc as dvc_mod
    from multimodal_feature_learning_tpu.models.criterion import (
        SetCriterion, build_weight_dict,
    )

    BATCH = 16
    cfg = _flagship_cfg(batch_size=BATCH)
    vocab_size = real_vocab_size()
    batch = real_batches(cfg, vocab_size, n_batches=1)[0]
    rng = jax.random.PRNGKey(1)

    real_hungarian = dvc_mod.hungarian_match

    def build_variant(stub_match=False, aux=True, caption_w=True):
        """Returns (step_fn, initial_state); step compiles on first call."""
        import copy

        vcfg = cfg
        if not aux:
            vcfg = copy.deepcopy(cfg)
            vcfg.dvc.aux_loss = False
            vcfg.dvc.detr.use_enc_aux_loss = False
        model = dvc_mod.build_model(vcfg, vocab_size)
        if stub_match:
            G = cfg.dataset.activity_net.max_gt_target_segments

            def fake_match(pred_segments, gt_segments, gt_mask, cs, cg):
                B = pred_segments.shape[0]
                return jnp.tile(
                    jnp.arange(G)[None, :] % pred_segments.shape[1], (B, 1)
                )
        try:
            if stub_match:
                dvc_mod.hungarian_match = fake_match
            params = model.init(jax.random.PRNGKey(0), batch)
            weight_dict = build_weight_dict(vcfg)
            if not caption_w:
                weight_dict = {k: v for k, v in weight_dict.items()
                               if "caption" not in k}
            criterion = SetCriterion(
                num_classes=vcfg.dvc.num_classes, weight_dict=weight_dict,
                losses=[l for l in vcfg.dvc.losses
                        if caption_w or l != "captions"],
                pad_idx=1, smoothing=vcfg.dvc.smoothing,
            )
            tx = make_optimizer(cfg, steps_per_epoch=100)
            state = create_train_state(params, tx)
            step = make_train_step(model, criterion, weight_dict, tx)
            state, m, _ = step(state, batch, rng)  # compile (patch active)
            _sync(m["loss"])
        finally:
            dvc_mod.hungarian_match = real_hungarian
        return step, state

    variants = [
        ("full", {}),
        ("no-match (arange indices)", {"stub_match": True}),
        ("no-aux (main match only)", {"aux": False}),
        ("no-caption-loss (decoder bwd pruned)", {"caption_w": False}),
    ]
    built = []
    for name, kw in variants:
        step, state = build_variant(**kw)
        built.append((name, step, state))
        print(f"# compiled {name}", file=sys.stderr, flush=True)

    # interleaved rounds: tunnel-RTT drift hits all variants equally
    ROUNDS, CHUNK = 6, 4
    times = {name: [] for name, *_ in built}
    states = {name: st for name, _, st in built}
    for r in range(ROUNDS):
        for name, step, _ in built:
            st = states[name]
            t0 = time.perf_counter()
            for _ in range(CHUNK):
                st, m, _ = step(st, batch, rng)
            _sync(m["loss"])
            times[name].append((time.perf_counter() - t0) / CHUNK * 1e3)
            states[name] = st

    print(f"| variant | median ms/step | min | rounds |")
    print("|---|---|---|---|")
    for name, *_ in built:
        t = sorted(times[name])
        med = t[len(t) // 2]
        print(f"| {name} | {med:.1f} | {t[0]:.1f} | "
              + ",".join(f"{x:.0f}" for x in times[name]) + " |")


if __name__ == "__main__":
    main()
