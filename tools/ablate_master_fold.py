"""Measure the f32-master fold (VERDICT r3 item 9 / PERF.md byte lever).

Runs N production-shape train steps on the chip twice — f32 masters
(default) vs bf16-folded masters (cfg.master_dtype="bfloat16": params AND
adam moments in bf16) — and reports step time + the loss-curve overlay so the
byte saving can be weighed against update-precision drift.

Usage: python tools/ablate_master_fold.py [--steps 30] [--batch 16]
Prints one JSON line.
"""

import argparse
import json
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--lazy-sync", action="store_true",
                    help="collect per-step loss arrays and fetch them ONCE "
                         "at the end instead of float()-syncing every step: "
                         "same curve, but the wall time measures device "
                         "throughput instead of step+tunnel-RTT serialization")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/mfl_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    sys.path.insert(0, "/root/repo")
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

    B = args.batch
    cfg = _flagship_cfg(batch_size=B)
    cfg.compute_dtype = "bfloat16"  # production mixed-precision trunk
    vocab_size = real_vocab_size()
    model = build_model(cfg, vocab_size)
    batches = real_batches(cfg, vocab_size, n_batches=4)
    dev_batches = [jax.device_put(b) for b in batches]
    params0 = model.init(jax.random.PRNGKey(0), batches[0])
    params_host = jax.tree_util.tree_map(np.asarray, params0)

    weight_dict = build_weight_dict(cfg)
    criterion = SetCriterion(
        num_classes=cfg.dvc.num_classes, weight_dict=weight_dict,
        losses=["labels", "segments", "captions", "contexts",
                "mask_prediction"],
        pad_idx=1, smoothing=cfg.dvc.smoothing,
    )
    tx = make_optimizer(cfg, steps_per_epoch=100)
    step = make_train_step(model, criterion, weight_dict, tx)

    rows = {}
    curves = {}
    for name, master in (("f32_master", None), ("bf16_fold", "bfloat16")):
        import jax.numpy as jnp
        params = jax.tree_util.tree_map(jnp.asarray, params_host)
        state = create_train_state(params, tx, master_dtype=master)
        rng = jax.random.PRNGKey(1)
        # warmup/compile step (not timed, not part of the curve comparison:
        # both variants run it identically from the same init)
        state, m, _ = step(state, dev_batches[0], rng)
        float(m["loss"])
        losses = []
        t0 = time.time()
        for i in range(args.steps):
            # fold the step index into the key so dropout masks differ per
            # step (curves reflect real training dynamics); both variants see
            # the identical key sequence so the A/B stays exact
            state, m, _ = step(state, dev_batches[i % len(dev_batches)],
                               jax.random.fold_in(rng, i))
            if args.lazy_sync:
                losses.append(m["loss"])  # device array; fetched below
            else:
                losses.append(float(m["loss"]))  # sync each step
        if args.lazy_sync:
            losses = [float(v) for v in jax.device_get(losses)]
        dt = time.time() - t0
        rows[f"{name}_step_ms"] = round(1000 * dt / args.steps, 2)
        rows[f"{name}_loss_first"] = round(losses[0], 4)
        rows[f"{name}_loss_last"] = round(losses[-1], 4)
        curves[name] = [round(x, 4) for x in losses]
        print(f"# {name}: {rows[f'{name}_step_ms']} ms/step, "
              f"loss {losses[0]:.3f} -> {losses[-1]:.3f}", file=sys.stderr)

    a, b = np.array(curves["f32_master"]), np.array(curves["bf16_fold"])
    rows["max_abs_loss_delta"] = round(float(np.max(np.abs(a - b))), 4)
    rows["mean_rel_loss_delta"] = round(
        float(np.mean(np.abs(a - b) / np.maximum(np.abs(a), 1e-6))), 5)
    rows["speedup_pct"] = round(
        100 * (rows["f32_master_step_ms"] / rows["bf16_fold_step_ms"] - 1), 2)
    rows["curves"] = curves
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
