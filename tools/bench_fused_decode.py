"""On-chip A/B: decode_impl=xla vs fused (vs fused+int8 K/V) at the serving
config (bf16 trunk, B=16, production shapes).

Times the full forward_eval('serve') path — identical except for the greedy
caption-decode backend — so the delta is attributable to the decode loop
(PERF.md attributes 14.4 of 21.9 ms of the serve step to decode).

Usage: python tools/bench_fused_decode.py [--batch 16] [--iters 24]
Prints one JSON line with videos/s and step ms per config.
"""

import argparse
import json
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=24)
    ap.add_argument("--configs", default="xla,fused,fusedb,fusedb_int8",
                    help="xla | fused[b][_int8]: 'b' = batch-tiled grid "
                         "(cfg.decode_fused_grid='batch')")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/mfl_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _flagship_cfg
    from bench import real_batches, real_vocab_size, time_fn
    from multimodal_feature_learning_tpu.models.dvc import build_model

    B = args.batch
    vocab_size = real_vocab_size()
    rows = {}
    params_host = None
    batches = None

    for name in args.configs.split(","):
        cfg = _flagship_cfg(batch_size=B)
        cfg.compute_dtype = "bfloat16"
        if name.startswith("fused"):
            cfg.decode_impl = "fused"
            cfg.decode_fused_grid = ("batch" if name.startswith("fusedb")
                                     else "video")
        if name.endswith("int8"):
            cfg.decode_kv = "int8"
        model = build_model(cfg, vocab_size)
        if batches is None:
            batches = real_batches(cfg, vocab_size)
            dev_batches = [jax.device_put(b) for b in batches]
        if params_host is None:
            p = model.init(jax.random.PRNGKey(0), batches[0])
            params_host = jax.tree_util.tree_map(np.asarray, p)
        import jax.numpy as jnp
        params = jax.tree_util.tree_map(jnp.asarray, params_host)

        @jax.jit
        def infer(params, batch, mdl=model):
            out, captions, indices, _, _ = mdl.forward_eval(params, batch, "serve")
            return captions, out["pred_segments"], indices

        t0 = time.time()
        try:
            dt = time_fn(infer, [(params, b) for b in dev_batches], args.iters,
                         (params, dev_batches[0]))
        except Exception as e:  # noqa: BLE001 — record, keep measuring
            rows[f"{name}_error"] = f"{type(e).__name__}: {str(e)[:300]}"
            print(f"# {name} FAILED: {rows[f'{name}_error']}", file=sys.stderr)
            continue
        rows[f"{name}_videos_per_s"] = round(B * args.iters / dt, 3)
        rows[f"{name}_step_ms"] = round(1000 * dt / args.iters, 2)
        rows[f"{name}_total_s"] = round(time.time() - t0, 1)
        print(f"# {name}: {rows[f'{name}_videos_per_s']} v/s "
              f"({rows[f'{name}_step_ms']} ms/step)", file=sys.stderr)

    print(json.dumps(rows))


if __name__ == "__main__":
    main()
