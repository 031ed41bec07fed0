"""Train/inference step breakdown on the real chip at production shapes.

Times each stage of the flagship pipeline as its own jitted program (hard
host-transfer syncs, the axon tunnel ignores block_until_ready):

  stages:   base+sparse encoder | decoder | matcher | caption fwd |
            full fwd | full fwd+bwd | fwd+bwd+adamw (= the train step) |
            greedy decode (eval)

Stage times overlap (each re-runs its prefix), so the interesting numbers are
the *deltas* between consecutive rows, printed as `delta` — e.g. the matcher
cost is t(matcher) - t(decoder). Compilation is cached per stage.

Usage: python tools/profile_train.py [--iters 20]
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


def timed(fn, args, iters):
    _sync(fn(*args))  # compile
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    _sync(outs[-1])
    return (time.perf_counter() - t0) / iters * 1e3


def cost(fn, args):
    """XLA's own per-program cost model: (GFLOPs, GB accessed) or (nan, nan).

    `compile().cost_analysis()` reports the compiler's static estimate of
    executed flops and bytes touched — the numerator for a per-stage roofline
    (tools/profile_train.py feeds PERF.md)."""
    try:
        ca = fn.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return (float(ca.get("flops", float("nan"))) / 1e9,
                float(ca.get("bytes accessed", float("nan"))) / 1e9)
    except Exception as e:  # tunnel backends may not expose it
        print(f"# cost_analysis unavailable: {type(e).__name__}: {e}")
        return float("nan"), float("nan")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    p.add_argument("--msda-backend", default="",
                   help="override cfg.msda_backend (matmul | matmul_acc | gather | pallas)")
    p.add_argument("--train-only", action="store_true",
                   help="time only the full train step (skip prefix stages)")
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
    from multimodal_feature_learning_tpu.models.criterion import (
        SetCriterion, build_weight_dict,
    )
    from multimodal_feature_learning_tpu.models.dvc import build_model

    BATCH = args.batch
    cfg = _flagship_cfg(batch_size=BATCH)
    cfg.compute_dtype = args.dtype
    if args.msda_backend:
        cfg.msda_backend = args.msda_backend
    vocab_size = real_vocab_size()
    model = build_model(cfg, vocab_size)
    batch = real_batches(cfg, vocab_size, n_batches=1)[0]
    params = model.init(jax.random.PRNGKey(0), batch)

    weight_dict = build_weight_dict(cfg)
    criterion = SetCriterion(
        num_classes=cfg.dvc.num_classes, weight_dict=weight_dict,
        losses=list(cfg.dvc.losses), pad_idx=1, smoothing=cfg.dvc.smoothing,
    )

    rows = []

    @jax.jit
    def st_encode(params, batch):
        p = model._cast_params(params)
        out = model.proposal_net.apply(
            p["proposal"],
            batch["video_tensor"].astype(model.compute_dtype),
            batch["video_mask"], batch["durations"], True,
        )
        return out["pred_segments"]

    @jax.jit
    def st_match(params, batch):
        out, indices, _ = model._propose_and_match(
            model._cast_params(params), batch, deterministic=True, with_aux=False
        )
        return indices

    @jax.jit
    def st_fwd(params, batch):
        rng = jax.random.PRNGKey(0)
        out, indices, indices_aux, mm = model.forward_train(params, batch, rng)
        return out["pred_captions"]

    def loss_fn(params, batch, rng):
        out, indices, indices_aux, mm = model.forward_train(params, batch, rng)
        losses = criterion(out, batch, indices, indices_aux, mm)
        return sum(losses[k] * weight_dict[k] for k in losses if k in weight_dict)

    @jax.jit
    def st_fwd_loss(params, batch):
        return loss_fn(params, batch, jax.random.PRNGKey(0))

    @jax.jit
    def st_fwd_bwd(params, batch):
        return jax.grad(loss_fn)(params, batch, jax.random.PRNGKey(0))

    tx = make_optimizer(cfg, steps_per_epoch=100)
    state = create_train_state(params, tx)
    train_step = make_train_step(model, criterion, weight_dict, tx)

    @jax.jit
    def st_greedy(params, batch):
        out, captions, *_ = model.forward_eval(params, batch, "serve")
        return captions

    stages = () if args.train_only else (
        ("propose (enc+dec heads)", st_encode),
        ("propose+match", st_match),
        ("full fwd (train)", st_fwd),
        ("fwd+criterion", st_fwd_loss),
        ("fwd+criterion+bwd", st_fwd_bwd),
        ("greedy decode (serve)", st_greedy),
    )
    for name, fn in stages:
        rows.append((name, timed(fn, (params, batch), args.iters),
                     *cost(fn, (params, batch))))

    # train_step donates the state (params included), so it must run LAST
    # and thread the state through the loop
    rng = jax.random.PRNGKey(1)
    ts_cost = cost(train_step, (state, batch, rng))  # lowering doesn't execute
    state, m, _ = train_step(state, batch, rng)
    _sync(m["loss"])
    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, m, _ = train_step(state, batch, rng)
    _sync(m["loss"])
    rows.append(("train step (+adamw+norms)",
                 (time.perf_counter() - t0) / args.iters * 1e3, *ts_cost))

    # v5e roofline constants: 197 TF/s bf16 MXU peak, 819 GB/s HBM.
    PEAK_TF = 197.0 if args.dtype == "bfloat16" else 98.5
    HBM_GBS = 819.0
    ridge = PEAK_TF * 1e3 / HBM_GBS  # flops/byte at the roofline ridge

    print(f"\n# B={BATCH} vocab={vocab_size} iters={args.iters} "
          f"dtype={args.dtype} platform={jax.devices()[0].platform}")
    print(f"# roofline: peak {PEAK_TF} TF/s, HBM {HBM_GBS} GB/s, "
          f"ridge AI {ridge:.0f} flop/B\n")
    print("| stage | ms | delta vs prev | GFLOP | GB | MFU% | GB/s | AI | bound |")
    print("|---|---|---|---|---|---|---|---|---|")
    prev = 0.0
    for name, ms, gf, gb in rows:
        mfu = 100 * gf / (ms / 1e3) / (PEAK_TF * 1e3)
        bw = gb / (ms / 1e3)
        ai = gf / gb if gb == gb and gb > 0 else float("nan")
        # what the stage's own (AI, achieved-fraction) says binds it: compute
        # if its AI clears the ridge, memory if it achieves a large HBM
        # fraction, otherwise latency/overhead (small grids, scan carries,
        # dispatch) — the usual fate of a 15-30M-param model.
        if ai == ai and ai >= ridge:
            bound = "compute"
        elif bw >= 0.5 * HBM_GBS:
            bound = "memory"
        else:
            bound = "latency/overhead"
        print(f"| {name} | {ms:.2f} | {ms - prev:+.2f} | {gf:.1f} | {gb:.2f} "
              f"| {mfu:.1f} | {bw:.0f} | {ai:.0f} | {bound} |")
        prev = ms

if __name__ == "__main__":
    main()
