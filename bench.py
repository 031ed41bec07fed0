"""End-to-end DVC inference throughput benchmark (one real chip).

Measures videos/sec through the full flagship pipeline — base encoder pyramid,
sparse deformable encoder (rho=0.5), deformable decoder, in-graph Hungarian
matching, per-event memory crop, KV-cached greedy caption decode (20 steps,
B*max_gt=160 caption rows/batch) — on synthetic val_1-shaped inputs.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the driver north star of 8 videos/sec/chip (BASELINE.json; the
reference publishes no throughput numbers).
"""

import json
import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/mfl_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from __graft_entry__ import _flagship_cfg, _synth_batch
    from multimodal_feature_learning_tpu.models.dvc import build_model

    BATCH = 16
    cfg = _flagship_cfg(batch_size=BATCH)
    vocab_size = 6000
    model = build_model(cfg, vocab_size)
    batches = [_synth_batch(cfg, BATCH, vocab_size, seed=s) for s in range(8)]
    params = model.init(jax.random.PRNGKey(0), batches[0])

    @jax.jit
    def infer(params, batch):
        # 'serve': greedy captions + segments + matching, no loss-only passes
        out, captions, indices, _, _ = model.forward_eval(params, batch, "serve")
        return captions, out["pred_segments"], indices

    # warmup/compile
    jax.block_until_ready(infer(params, batches[0]))

    n_iters = 24
    t0 = time.perf_counter()
    outs = []
    for i in range(n_iters):
        outs.append(infer(params, batches[i % len(batches)]))
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0

    videos_per_sec = BATCH * n_iters / dt
    result = {
        "metric": "dvc_inference_videos_per_sec_per_chip",
        "value": round(videos_per_sec, 3),
        "unit": "videos/s",
        "vs_baseline": round(videos_per_sec / 8.0, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
