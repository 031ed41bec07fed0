"""Decompose the serving step: proposal stack vs greedy decode, and the
decode's per-token / per-layer fixed cost.

Answers the question PERF.md raises about the flat serving batch curve: the
decode loop's ~20 sequential scan steps are tiny matmuls whose FLOPs are
negligible, so where does the time go? This tool measures, on the real chip
with hard syncs (bench.py::_sync semantics):

  1. full forward_serve wall             (B=16 bf16, production dims)
  2. proposal-stack-only wall            (same program minus the decode)
  3. forward_serve at Lc in {8, 20}      -> per-decode-token slope
  4. forward_serve at caption depth {3, 6} (random params; timing only)
       -> per-layer share of the per-token cost

Usage: python tools/profile_decode.py  (takes ~5-10 min incl. compiles of the
Lc=8/depth=3 variants; run alone — concurrent CPU load skews dispatch time).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _sync(out):
    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[0]))


def time_fn(fn, args, n=20, reps=2):
    _sync(fn(*args))  # compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / n)
    return 1000.0 * best  # ms


def build(batch, lc, depth):
    import jax

    from __graft_entry__ import _flagship_cfg
    from bench import real_vocab_size
    from multimodal_feature_learning_tpu.models.dvc import build_model

    cfg = _flagship_cfg(batch_size=batch)
    cfg.compute_dtype = "bfloat16"
    cfg.dataset.activity_net.max_caption_len_all = lc
    cfg.dvc.caption.depth = depth
    model = build_model(cfg, real_vocab_size())
    B = batch
    T = cfg.dataset.activity_net.video_rescale_len
    D = cfg.dvc.detr.feature_dim
    G = cfg.dataset.activity_net.max_gt_target_segments
    batch0 = {
        "video_tensor": np.zeros((B, T, D), np.float32),
        "video_mask": np.zeros((B, T), bool),
        "durations": np.full((B,), 60.0, np.float32),
        "gt_segments": np.zeros((B, G, 2), np.float32),
        "gt_mask": np.zeros((B, G), bool),
        "cap_tokens": np.full((B, G, lc), 1, np.int32),
    }
    params = jax.device_put(model.init(jax.random.PRNGKey(0), batch0))
    video = jax.device_put(
        np.random.default_rng(0).normal(size=(B, T, D)).astype(np.float32))
    mask = jax.device_put(np.zeros((B, T), bool))
    durs = jax.device_put(np.full((B,), 60.0, np.float32))
    return model, params, (video, mask, durs)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/mfl_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    B = 16

    rows = {}

    # 1+2: full serve vs proposal-only at production dims
    model, params, args = build(B, 20, 6)
    serve = jax.jit(lambda p, v, m, d: model.forward_serve(p, v, m, d))

    def proposal_only(p, v, m, d):
        import jax.numpy as jnp

        p = model._cast_params(p)
        out = model.proposal_net.apply(
            p["proposal"], v.astype(model.compute_dtype), m, d, True)
        seg_all = out["outputs_segment_all"]
        scores = -jnp.mean(jnp.abs(seg_all[1:] - seg_all[:-1]), axis=(0, 3))
        return jax.lax.top_k(scores, model.max_gt)

    prop = jax.jit(proposal_only)
    rows["serve_Lc20_d6_ms"] = round(time_fn(serve, (params,) + args), 2)
    rows["proposal_only_ms"] = round(time_fn(prop, (params,) + args), 2)
    rows["decode_Lc20_d6_ms"] = round(
        rows["serve_Lc20_d6_ms"] - rows["proposal_only_ms"], 2)

    # 3: per-token slope from the Lc=8 variant
    model8, params8, args8 = build(B, 8, 6)
    serve8 = jax.jit(lambda p, v, m, d: model8.forward_serve(p, v, m, d))
    rows["serve_Lc8_d6_ms"] = round(time_fn(serve8, (params8,) + args8), 2)
    rows["ms_per_decode_token_d6"] = round(
        (rows["serve_Lc20_d6_ms"] - rows["serve_Lc8_d6_ms"]) / 12.0, 3)

    # 4: per-layer share from the depth=3 variant (random params: timing only)
    model3, params3, args3 = build(B, 20, 3)
    serve3 = jax.jit(lambda p, v, m, d: model3.forward_serve(p, v, m, d))
    rows["serve_Lc20_d3_ms"] = round(time_fn(serve3, (params3,) + args3), 2)
    model3b, params3b, args3b = build(B, 8, 3)
    serve3b = jax.jit(lambda p, v, m, d: model3b.forward_serve(p, v, m, d))
    rows["serve_Lc8_d3_ms"] = round(time_fn(serve3b, (params3b,) + args3b), 2)
    rows["ms_per_decode_token_d3"] = round(
        (rows["serve_Lc20_d3_ms"] - rows["serve_Lc8_d3_ms"]) / 12.0, 3)
    per_layer = (rows["ms_per_decode_token_d6"]
                 - rows["ms_per_decode_token_d3"]) / 3.0
    rows["ms_per_token_per_layer"] = round(per_layer, 4)
    rows["ms_per_token_depth_independent"] = round(
        rows["ms_per_decode_token_d6"] - 6 * per_layer, 4)

    for k, v in rows.items():
        print(f"{k}: {v}")


if __name__ == "__main__":
    main()
