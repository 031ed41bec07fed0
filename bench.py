"""End-to-end DVC benchmark on one real chip, at production shapes.

Headline: inference videos/sec through the full flagship pipeline — base
encoder pyramid, sparse deformable encoder (rho=0.5), deformable decoder,
in-graph Hungarian matching, per-event memory crop, KV-cached greedy caption
decode — on REAL ActivityNet val_1 annotation shapes (real vocab size, real
per-video event counts/durations via the production collate; features are
synthetic arrays of the production shape since no feature h5 ships in-image).

Protocol (recorded in the JSON as "protocol"):
  * every row is best-of-N timing passes (N=2, +1 retry for a pass flagged
    degraded by the tunnel RTT probe — the axon tunnel's dispatch RTT
    fluctuates ~3x on ~10-min timescales);
  * rows suffixed `_dev` time DEVICE-RESIDENT inputs (jax.device_put outside
    the loop) — the device-compute path a production host with pipelined
    prefetch would see. Unsuffixed inference/train rows feed numpy batches
    per call (host->device transfer of ~10 MB/batch rides the tunnel and is
    the dominant cost here; on real TPU hosts that transfer is PCIe/DMA and
    overlapped by prefetch);
  * `_bf16` rows run the mixed-precision trunk (utils/precision.py policy:
    f32 master params, bf16 matmuls, f32 logits/loss) — quality parity is
    pinned by tests/test_bf16.py and QUALITY.md;
  * latency rows are per-dispatch wall times at B=1 (single video), p50/p95;
  * the headline is the best videos/s across serving configs; the winning
    config is recorded as "headline_config".

RESILIENCE (the round-4 bench died rc=124/parsed-null when the tunnel data
path wedged mid-run and every measured row was lost because results printed
only at process exit):
  * a device-health probe runs FIRST in a subprocess with a hard timeout; a
    wedged tunnel produces a parseable JSON line saying so instead of a hang;
  * every row streams to stderr flushed the moment it is measured, and is
    appended to a sidecar JSONL (/tmp/mfl_bench_stream.jsonl);
  * SIGTERM/SIGINT/SIGALRM handlers and a watchdog thread (global --budget-s
    self-budget + a no-progress stall detector) print the final JSON line
    with whatever has been measured, marked "partial": true, then exit —
    one bad window degrades the bench, it cannot erase it;
  * sections run most-important-first (headline serving rows, then the fused
    decode kernel, then train) so a partial capture still carries the story.

Prints ONE JSON line to stdout:
  {"metric", "value", "unit", "vs_baseline", "rows", "protocol", ...}
Baseline: the driver north star of 8 videos/sec/chip (BASELINE.json; the
reference publishes no throughput numbers).
"""

import argparse
import json
import os
import signal
import subprocess
import sys
import threading
import time

import numpy as np

import jax  # noqa: E402  (used by _sync before main's config)

ANET = "/root/reference/anet_data"
FALLBACK_VOCAB = 6563  # len(build_vocab(train.json, min_freq=2)), measured

# serving batch sizes for the scaling curve (VERDICT r2 #8)
SERVE_BATCHES = (16, 32, 64, 128)
# serving compute dtype: bf16 trunk measured 1.7x faster at identical greedy
# tokens on >90% of events (tests/test_bf16.py) and quality deltas within
# noise (QUALITY.md); f32 rows are kept alongside for comparison
RTT_DEGRADED_MS = 25.0  # tiny-op sync RTT above this flags a degraded window

STREAM_PATH = "/tmp/mfl_bench_stream.jsonl"


# --------------------------------------------------------------------------
# resilience state: rows stream as measured; any exit path emits final JSON
# --------------------------------------------------------------------------

ROWS = {}
STATE = {
    "finalized": False,
    "deadline": None,        # monotonic time after which the watchdog fires
    "last_progress": time.monotonic(),
    "stall_limit_s": 600.0,  # no sync/row for this long => wedged window
                             # (600 not 420: a COLD k8-multistep compile is
                             # a legitimate 5-7 min gap with no sync progress;
                             # the budget still bounds the total run)
    "partial_reason": None,
    "emit_lock": threading.Lock(),
}


def emit(key, value):
    """Record one measurement and stream it immediately (flushed)."""
    with STATE["emit_lock"]:
        ROWS[key] = value
        print(f"# {key}: {value}", file=sys.stderr, flush=True)
        try:
            with open(STREAM_PATH, "a") as f:
                f.write(json.dumps({key: value}) + "\n")
        except OSError:
            pass
    STATE["last_progress"] = time.monotonic()


def _headline(rows):
    """Best serving configuration among whatever rows exist."""
    candidates = {}
    for key, name in (
        ("greedy_k8_infer_videos_per_s", "greedy_k8"),
        ("greedy_infer_dev_videos_per_s", "greedy_dev_f32_B16"),
    ):
        if key in rows:
            candidates[name] = rows[key]
    for key, val in rows.items():
        # greedy_dev_bf16_B{B}_videos_per_s and the fused-decode rows
        if key.startswith("greedy_dev_bf16_B") and key.endswith("_videos_per_s"):
            candidates[key[: -len("_videos_per_s")]] = val
        if key.startswith("greedy_infer_dev_bf16_fused") and key.endswith(
                "_videos_per_s"):
            candidates[key[len("greedy_infer_dev_"):-len("_videos_per_s")]
                       + "_B16"] = val
    if not candidates:
        return None, 0.0
    best = max(candidates, key=candidates.get)
    return best, candidates[best]


def finalize(partial=False, reason=None, exit_now=False):
    """Print the final JSON line from whatever ROWS holds. Idempotent."""
    with STATE["emit_lock"]:
        if STATE["finalized"]:
            if exit_now:
                os._exit(0)
            return
        STATE["finalized"] = True
    rows = dict(ROWS)
    rtt_samples = _RTT_STATE["samples"]
    if rtt_samples:
        rows.setdefault("tunnel_rtt_ms_min", round(min(rtt_samples), 2))
        rows.setdefault("tunnel_rtt_ms_max", round(max(rtt_samples), 2))
    degraded = bool(rtt_samples) and min(rtt_samples) > RTT_DEGRADED_MS
    headline_config, videos_per_sec = _headline(rows)
    result = {
        "metric": "dvc_inference_videos_per_sec_per_chip",
        "value": videos_per_sec,
        "unit": "videos/s",
        "vs_baseline": round(videos_per_sec / 8.0, 3),
        "headline_config": headline_config,
        "degraded_window": degraded,
        # the degraded flag tracks host<->device dispatch RTT, which only the
        # host-fed rows pay; every headline candidate is device-resident or
        # K-batched and reproduces within ~4% across healthy and degraded
        # windows (587-676 v/s measured under 24-114 ms RTT)
        "headline_rtt_sensitive": False,
        "protocol": "best-of-2 passes (+1 retry on RTT>25ms); _dev rows use "
                    "device-resident inputs; see bench.py docstring",
        "rows": rows,
    }
    if partial:
        result["partial"] = True
        result["partial_reason"] = reason or STATE["partial_reason"]
    print(json.dumps(result), flush=True)
    if exit_now:
        os._exit(0)


def _signal_handler(signum, frame):  # noqa: ARG001
    finalize(partial=True, reason=f"signal {signal.Signals(signum).name}",
             exit_now=True)


def _watchdog():
    """Fires the partial dump if the budget runs out OR no sync/row progress
    happens for stall_limit_s (a wedged tunnel blocks inside device_get, which
    a signal alone may not interrupt cleanly — this thread always can)."""
    while not STATE["finalized"]:
        time.sleep(2.0)
        now = time.monotonic()
        if STATE["deadline"] is not None and now > STATE["deadline"]:
            finalize(partial=True, reason="self budget exceeded", exit_now=True)
        if now - STATE["last_progress"] > STATE["stall_limit_s"]:
            finalize(partial=True,
                     reason=f"no progress for {STATE['stall_limit_s']:.0f}s "
                            "(tunnel stall)", exit_now=True)


def budget_left():
    if STATE["deadline"] is None:
        return float("inf")
    return STATE["deadline"] - time.monotonic()


def probe_device_health(timeout_s=120.0, retries=1, retry_wait_s=20.0):
    """Run one tiny matmul in a SUBPROCESS with a hard timeout. Returns
    (ok, seconds_or_reason). A wedged tunnel hangs inside the runtime where
    in-process timeouts can't always reach — the subprocess boundary can."""
    code = ("import jax, jax.numpy as jnp, time; t0=time.time();"
            "x=jnp.ones((512,512), jnp.bfloat16);"
            "v=float((x@x).sum()); print('OK', round(time.time()-t0,1))")
    for attempt in range(retries + 1):
        try:
            r = subprocess.run(
                [sys.executable, "-c", code], capture_output=True, text=True,
                timeout=timeout_s,
            )
            if r.returncode == 0 and "OK" in r.stdout:
                return True, float(r.stdout.split()[1])
            reason = f"probe rc={r.returncode}: {r.stderr[-200:]}"
        except subprocess.TimeoutExpired:
            reason = f"probe timed out after {timeout_s:.0f}s"
        if attempt < retries:
            time.sleep(retry_wait_s)
    return False, reason


def section(name):
    """Context manager: a section failure records an error row, not a crash."""
    class _Section:
        def __enter__(self):
            return self

        def __exit__(self, exc_type, exc, tb):
            if exc is not None and not isinstance(exc, SystemExit):
                emit(f"{name}_error", f"{type(exc).__name__}: {str(exc)[:200]}")
                return True  # swallow: keep benching
            return False
    return _Section()


# --------------------------------------------------------------------------


def real_vocab_size():
    """Real vocabulary size from the reference train annotations (cached)."""
    cache = "/tmp/mfl_bench_vocab_size.json"
    if os.path.exists(cache):
        return json.load(open(cache))["size"]
    train_json = os.path.join(ANET, "train.json")
    if not os.path.exists(train_json):
        return FALLBACK_VOCAB
    import json as _json

    from multimodal_feature_learning_tpu.data.vocab import build_vocab

    with open(train_json) as f:
        ann = _json.load(f)
    size = len(build_vocab(ann, min_freq=2))
    json.dump({"size": size}, open(cache, "w"))
    return size


def real_batches(cfg, vocab_size, n_batches=8, batch_size=None):
    """Batches with REAL val_1 annotation statistics through the production
    collate (event counts, durations, caption lengths); synthetic features."""
    import json as _json

    from multimodal_feature_learning_tpu.data.anet import (
        ActivityNetDataset, FeatureBackend, collate_fixed,
    )
    from multimodal_feature_learning_tpu.data.loader import split_batch

    B = batch_size or cfg.batch_size
    val_json = os.path.join(ANET, "val_1.json")
    if not os.path.exists(val_json):
        from __graft_entry__ import _synth_batch

        return [_synth_batch(cfg, B, vocab_size, seed=s)
                for s in range(n_batches)]

    import zlib

    class VocabStub:
        pad_idx, bos_idx, eos_idx = 1, 2, 3

        def __getitem__(self, tok):
            # crc32: run-stable token ids (hash() is PYTHONHASHSEED-randomized)
            return zlib.crc32(tok.encode()) % 6000 + 4

    anet = cfg.dataset.activity_net
    ds = ActivityNetDataset(
        val_json,
        FeatureBackend("", feature_dim=cfg.dvc.detr.feature_dim,
                       synthetic_len=180),
        VocabStub(), is_training=False,
        max_gt_target_segments=anet.max_gt_target_segments,
        max_caption_len=anet.max_caption_len_all,
    )
    batches = []
    for i in range(n_batches):
        samples = [ds[(i * B + j) % len(ds)] for j in range(B)]
        batch = collate_fixed(
            samples, 1, video_rescale_len=anet.video_rescale_len,
            max_gt=anet.max_gt_target_segments,
            max_caption_len=anet.max_caption_len_all, pad_to_batch=B,
        )
        arrays, _ = split_batch(batch)
        batches.append(arrays)
    return batches


def _sync(out):
    """HARD device sync via host transfer of one element.

    jax.block_until_ready does NOT wait on the axon tunnel platform (measured:
    wall time constant regardless of queued device work). The chip executes
    dispatches in order, so transferring one element of the LAST output blocks
    until everything before it finished."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[0]))
    STATE["last_progress"] = time.monotonic()


_RTT_STATE = {"fn": None, "x": None, "samples": []}


def measure_rtt(n=6):
    """Tiny-op sync round-trip in ms (tunnel health probe)."""
    if _RTT_STATE["fn"] is None:
        _RTT_STATE["x"] = jax.device_put(np.float32(1.0))
        _RTT_STATE["fn"] = jax.jit(lambda v: v + 1)
        _sync(_RTT_STATE["fn"](_RTT_STATE["x"]))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        _sync(_RTT_STATE["fn"](_RTT_STATE["x"]))
        ts.append((time.perf_counter() - t0) * 1000)
    rtt = float(np.median(ts))
    _RTT_STATE["samples"].append(rtt)
    return rtt


def time_fn(fn, args_list, n_iters, warmup_args, passes=2, max_retries=1):
    """Best-of-`passes` wall time; a pass taken in a degraded tunnel window
    (RTT probe above RTT_DEGRADED_MS right after the pass) is re-run up to
    `max_retries` extra times."""
    _sync(fn(*warmup_args))  # compile
    best = float("inf")
    retries = 0
    p = 0
    while p < passes:
        t0 = time.perf_counter()
        outs = [fn(*args_list[i % len(args_list)]) for i in range(n_iters)]
        _sync(outs[-1])
        dt = time.perf_counter() - t0
        best = min(best, dt)
        rtt = measure_rtt()
        if rtt > RTT_DEGRADED_MS and retries < max_retries:
            retries += 1
            continue  # degraded window: this pass doesn't count toward passes
        p += 1
    return best


def scrub_corrupt_cache(cache_dir="/tmp/mfl_jax_cache", min_size=1 << 20):
    """Remove corrupted persistent-cache entries (a killed process can leave
    truncated zstd frames; JAX then pays a full cold compile on EVERY run
    because the bad entry is read-failed but never rewritten). Only entries
    above min_size are checked — those are the multi-minute compiles."""
    import glob

    try:
        import zstandard
    except ImportError:
        return
    for f in glob.glob(os.path.join(cache_dir, "*-cache")):
        if os.path.getsize(f) < min_size:
            continue
        try:
            zstandard.ZstdDecompressor().decompress(
                open(f, "rb").read(), max_output_size=1 << 31
            )
        except Exception:
            os.remove(f)
            print(f"# removed corrupted cache entry {os.path.basename(f)}",
                  file=sys.stderr, flush=True)


def main():
    import jax

    ap = argparse.ArgumentParser()
    ap.add_argument("--budget-s", type=float,
                    default=float(os.environ.get("MFL_BENCH_BUDGET_S", 1380)),
                    help="self-imposed wall budget; on expiry the bench "
                         "prints partial JSON and exits 0 (set below the "
                         "driver's own timeout)")
    ap.add_argument("--stall-limit-s", type=float, default=600.0,
                    help="no-sync-progress window that declares the tunnel "
                         "wedged and dumps partial results")
    args, _ = ap.parse_known_args()

    STATE["deadline"] = time.monotonic() + args.budget_s
    STATE["stall_limit_s"] = args.stall_limit_s
    signal.signal(signal.SIGTERM, _signal_handler)
    signal.signal(signal.SIGINT, _signal_handler)
    try:
        signal.signal(signal.SIGALRM, _signal_handler)
        signal.alarm(int(args.budget_s + 60))  # belt over the watchdog braces
    except (AttributeError, ValueError):
        pass
    threading.Thread(target=_watchdog, daemon=True).start()
    try:
        os.remove(STREAM_PATH)
    except OSError:
        pass

    # -- device health FIRST: a wedged tunnel must produce a JSON line, not
    #    a silent hang into the driver's timeout -----------------------------
    ok, info = probe_device_health()
    if not ok:
        emit("device_health", f"WEDGED: {info}")
        finalize(partial=True, reason=f"tpu tunnel wedged at start: {info}")
        return
    emit("device_health_probe_s", info)

    scrub_corrupt_cache()
    jax.config.update("jax_compilation_cache_dir", "/tmp/mfl_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from __graft_entry__ import _flagship_cfg
    from multimodal_feature_learning_tpu.models.dvc import build_model

    BATCH = 16
    cfg = _flagship_cfg(batch_size=BATCH)
    cfg16 = _flagship_cfg(batch_size=BATCH)
    cfg16.compute_dtype = "bfloat16"
    vocab_size = real_vocab_size()
    model = build_model(cfg, vocab_size)
    model16 = build_model(cfg16, vocab_size)
    batches = real_batches(cfg, vocab_size)
    params_host = None

    def fresh_params():
        """Device params; train steps donate their state, so rebuild."""
        nonlocal params_host
        if params_host is None:
            p = model.init(jax.random.PRNGKey(0), batches[0])
            params_host = jax.tree_util.tree_map(np.asarray, p)
            return p
        import jax.numpy as jnp
        return jax.tree_util.tree_map(jnp.asarray, params_host)

    params = fresh_params()
    print(f"# vocab={vocab_size} batch={BATCH} "
          f"T={cfg.dataset.activity_net.video_rescale_len} "
          f"G={cfg.dataset.activity_net.max_gt_target_segments} "
          f"Lc={cfg.dataset.activity_net.max_caption_len_all}",
          file=sys.stderr, flush=True)

    emit("tunnel_rtt_ms", round(measure_rtt(), 2))

    def make_infer(mdl):
        @jax.jit
        def infer(params, batch):
            out, captions, indices, _, _ = mdl.forward_eval(params, batch, "serve")
            return captions, out["pred_segments"], indices
        return infer

    infer32 = make_infer(model)
    infer16 = make_infer(model16)
    dev_batches = [jax.device_put(b) for b in batches]
    n_iters = 24

    # ---------------- headline serving rows FIRST (device-resident bf16) ----
    with section("serve_dev_bf16"):
        dt = time_fn(infer16, [(params, b) for b in dev_batches], n_iters,
                     (params, dev_batches[0]))
        emit("greedy_infer_dev_bf16_videos_per_s", round(BATCH * n_iters / dt, 3))
        emit("greedy_infer_dev_bf16_step_ms", round(1000 * dt / n_iters, 2))
        emit(f"greedy_dev_bf16_B{BATCH}_videos_per_s",
             round(BATCH * n_iters / dt, 3))

    # ---------------- fused Pallas decode-step kernel (VERDICT r3 item 1) ---
    # same serve path, decode_impl="fused" with the batch-tiled grid (the
    # better of the two fused schedules, PERF.md round 5: 593 vs 522 v/s;
    # both lose to the xla scan — these rows are the recorded negative
    # result, kept so regressions/improvements in either path stay visible).
    for name, kv in (("fused", "dense"), ("fused_int8", "int8")):
        with section(f"serve_{name}"):
            cfgF = _flagship_cfg(batch_size=BATCH)
            cfgF.compute_dtype = "bfloat16"
            cfgF.decode_impl = "fused"
            cfgF.decode_fused_grid = "batch"
            cfgF.decode_kv = kv
            mdlF = build_model(cfgF, vocab_size)
            inferF = make_infer(mdlF)
            dt = time_fn(inferF, [(params, b) for b in dev_batches], 16,
                         (params, dev_batches[0]))
            emit(f"greedy_infer_dev_bf16_{name}_videos_per_s",
                 round(BATCH * 16 / dt, 3))
            emit(f"greedy_infer_dev_bf16_{name}_step_ms",
                 round(1000 * dt / 16, 2))

    # ---------------- K batches per dispatch (lax.scan) ---------------------
    with section("serve_k8"):
        K_INF = 8

        def make_infer_k(mdl):
            @jax.jit
            def infer_k(params, stacked):
                def body(_, batch):
                    out, captions, indices, _, _ = mdl.forward_eval(
                        params, batch, "serve")
                    return None, (captions, out["pred_segments"], indices)

                _, outs = jax.lax.scan(body, None, stacked)
                return outs
            return infer_k

        stacked_inf = jax.device_put(
            {k: np.stack([np.asarray(batches[i % len(batches)][k])
                          for i in range(K_INF)])
             for k in batches[0]}
        )
        dt = time_fn(make_infer_k(model), [(params, stacked_inf)], 3,
                     (params, stacked_inf))
        emit("greedy_k8_infer_videos_per_s", round(BATCH * K_INF * 3 / dt, 3))

    # ---------------- batch-scaling curve (serving, bf16) -------------------
    with section("serve_batch_curve"):
        for B in SERVE_BATCHES:
            if B == BATCH:
                continue  # emitted above
            if budget_left() < 240:
                emit("serve_batch_curve_skipped", f"B>={B}: budget")
                break
            cfgB = _flagship_cfg(batch_size=B)
            cfgB.compute_dtype = "bfloat16"
            mdlB = build_model(cfgB, vocab_size)
            bsB = [jax.device_put(b)
                   for b in real_batches(cfgB, vocab_size, n_batches=2,
                                         batch_size=B)]
            inferB = make_infer(mdlB)
            nB = max(2, 384 // B)
            dt = time_fn(inferB, [(params, b) for b in bsB], nB,
                         (params, bsB[0]))
            emit(f"greedy_dev_bf16_B{B}_videos_per_s", round(B * nB / dt, 3))

    # ---------------- f32 dev + host-fed rows -------------------------------
    with section("serve_f32_and_hostfed"):
        dt = time_fn(infer32, [(params, b) for b in dev_batches], n_iters,
                     (params, dev_batches[0]))
        emit("greedy_infer_dev_videos_per_s", round(BATCH * n_iters / dt, 3))
        emit("greedy_infer_dev_step_ms", round(1000 * dt / n_iters, 2))
        dt = time_fn(infer32, [(params, b) for b in batches], n_iters,
                     (params, batches[0]))
        emit("greedy_infer_videos_per_s", round(BATCH * n_iters / dt, 3))

        # host-fed with bf16 TRANSFER (cfg.transfer_dtype serving analog):
        # floats cast to bf16 on host (halving tunnel bytes), upcast inside
        # the program. Measured in training: 254 -> 118 s/epoch
        # (runs_conv_phase3.log)
        import jax.numpy as jnp

        def cast_tx(b):
            return {k: np.asarray(v).astype(jnp.bfloat16)
                    if np.asarray(v).dtype == np.float32 else v
                    for k, v in b.items()}

        @jax.jit
        def infer_tx16(params, batch):
            batch = {k: v.astype(jnp.float32)
                     if v.dtype == jnp.bfloat16 else v for k, v in batch.items()}
            out, captions, indices, _, _ = model.forward_eval(params, batch,
                                                              "serve")
            return captions, out["pred_segments"], indices

        tx_batches = [cast_tx(b) for b in batches]
        dt = time_fn(infer_tx16, [(params, b) for b in tx_batches], n_iters,
                     (params, tx_batches[0]))
        emit("greedy_infer_txbf16_videos_per_s", round(BATCH * n_iters / dt, 3))

    # ---------------- p50/p95 per-video latency (B=1, bf16 serving) ---------
    with section("latency_b1"):
        cfg1 = _flagship_cfg(batch_size=1)
        cfg1.compute_dtype = "bfloat16"
        mdl1 = build_model(cfg1, vocab_size)
        bs1 = [jax.device_put(b)
               for b in real_batches(cfg1, vocab_size, n_batches=8,
                                     batch_size=1)]
        infer1 = make_infer(mdl1)
        _sync(infer1(params, bs1[0]))  # compile
        lat = []
        for i in range(24):
            t0 = time.perf_counter()
            _sync(infer1(params, bs1[i % len(bs1)]))
            lat.append((time.perf_counter() - t0) * 1000)
        lat = np.asarray(lat)
        emit("latency_b1_p50_ms", round(float(np.percentile(lat, 50)), 2))
        emit("latency_b1_p95_ms", round(float(np.percentile(lat, 95)), 2))
        # B=1 latency over the tunnel includes one dispatch RTT; record it
        emit("latency_rtt_ms_at_measure", round(measure_rtt(), 2))

    # ---------------- other decode modes ------------------------------------
    with section("faster_eval_and_beam"):
        @jax.jit
        def infer_fast(params, batch):
            out, captions, indices, _, _ = model.forward_eval(
                params, batch, "serve", faster_eval=True
            )
            return captions, out["pred_segments"], indices

        dt = time_fn(infer_fast, [(params, b) for b in dev_batches], 8,
                     (params, dev_batches[0]))
        emit("faster_eval_infer_videos_per_s", round(BATCH * 8 / dt, 3))

        @jax.jit
        def infer_beam(params, batch):
            out, captions, indices, _, _ = model.forward_eval(
                params, batch, "beam", beam_size=4
            )
            return captions, out["pred_segments"], indices

        dt = time_fn(infer_beam, [(params, b) for b in dev_batches], 8,
                     (params, dev_batches[0]))
        emit("beam4_infer_videos_per_s", round(BATCH * 8 / dt, 3))

    # ---------------- continuous-batching server (VERDICT r4 item 3) --------
    # short in-bench load point: slot-refill server at production shapes,
    # offered load above the static server's measured capacity; the full
    # chunk/rps sweep lives in tools/load_test_serve.py + COMPONENTS.md.
    if budget_left() > 300:
        with section("serve_continuous"):
            from multimodal_feature_learning_tpu.config import (
                load_config, recompute_losses,
            )
            from serve import ContinuousDVCServer

            scfg = load_config("train")
            scfg.compute_dtype = "bfloat16"
            recompute_losses(scfg)

            class _V:
                pad_idx, bos_idx, eos_idx = 1, 2, 3

                def __getitem__(self, tok):
                    return 0

                def get_itos(self):
                    return ["w"] * vocab_size

            smodel = build_model(scfg, vocab_size, 1, 2, 3)
            T, D = (scfg.dataset.activity_net.video_rescale_len,
                    scfg.dvc.detr.feature_dim)
            sparams = smodel.init(jax.random.PRNGKey(0), {
                "video_tensor": np.zeros((16, T, D), np.float32),
                "video_mask": np.zeros((16, T), bool),
                "durations": np.ones((16,), np.float32),
                "gt_segments": np.zeros(
                    (16, scfg.dataset.activity_net.max_gt_target_segments, 2),
                    np.float32),
                "gt_mask": np.zeros(
                    (16, scfg.dataset.activity_net.max_gt_target_segments),
                    bool),
                "cap_tokens": np.full(
                    (16, scfg.dataset.activity_net.max_gt_target_segments,
                     scfg.dataset.activity_net.max_caption_len_all), 1,
                    np.int32),
            })
            server = ContinuousDVCServer(smodel, sparams, _V(), scfg,
                                         batch_size=16, chunk=4)
            rng = np.random.default_rng(0)
            feats = [rng.standard_normal((180, D)).astype(np.float32)
                     for _ in range(8)]
            n_req, rps = 128, 100.0
            lats, futs = [], []
            t0 = time.monotonic()
            for i in range(n_req):
                ts = time.monotonic()
                fut = server.submit(feats[i % len(feats)], 120.0)
                fut.add_done_callback(
                    lambda f, ts=ts: lats.append(time.monotonic() - ts))
                futs.append(fut)
                time.sleep(float(rng.exponential(1.0 / rps)))
            for f in futs:
                f.result()
            dt = time.monotonic() - t0
            server.close()
            lat_ms = np.asarray(sorted(lats)) * 1000
            emit("continuous_serve_rps_sustained", round(n_req / dt, 2))
            emit("continuous_serve_p50_ms",
                 round(float(np.percentile(lat_ms, 50)), 2))
            emit("continuous_serve_p95_ms",
                 round(float(np.percentile(lat_ms, 95)), 2))
    else:
        emit("serve_continuous_skipped", "budget")

    # ---------------- training ----------------------------------------------
    from multimodal_feature_learning_tpu.engine.state import (
        create_train_state, make_optimizer,
    )
    from multimodal_feature_learning_tpu.engine.train import (
        make_train_multistep, make_train_step,
    )
    from multimodal_feature_learning_tpu.models.criterion import (
        SetCriterion, build_weight_dict,
    )

    weight_dict = build_weight_dict(cfg)
    criterion = SetCriterion(
        num_classes=cfg.dvc.num_classes, weight_dict=weight_dict,
        losses=list(cfg.dvc.losses), pad_idx=1, smoothing=cfg.dvc.smoothing,
    )
    tx = make_optimizer(cfg, steps_per_epoch=100)
    rng = jax.random.PRNGKey(1)

    def run_train(mdl, suffix):
        train_step = make_train_step(mdl, criterion, weight_dict, tx)
        state = create_train_state(fresh_params(), tx)
        state, m, _ = train_step(state, dev_batches[0], rng)  # compile
        _sync(m["loss"])
        n_train = 12
        t0 = time.perf_counter()
        for i in range(n_train):
            state, m, _ = train_step(state, dev_batches[i % len(dev_batches)],
                                     rng)
        _sync(m["loss"])
        dt = time.perf_counter() - t0
        emit(f"train{suffix}_videos_per_s", round(BATCH * n_train / dt, 3))
        emit(f"train{suffix}_step_ms", round(1000 * dt / n_train, 2))

        # K=8 optimizer steps in ONE XLA program: the device-time proxy (the
        # per-dispatch overhead is amortized 8x, so per-step wall ~= device)
        K = 8
        multi_step = make_train_multistep(mdl, criterion, weight_dict, tx)
        stacked = jax.device_put(
            {k: np.stack([np.asarray(batches[i % len(batches)][k])
                          for i in range(K)])
             for k in batches[0]}
        )
        state2 = create_train_state(fresh_params(), tx)
        state2, m2, _ = multi_step(state2, stacked, rng)  # compile
        _sync(m2["loss"])
        n_disp = 3
        t0 = time.perf_counter()
        for _ in range(n_disp):
            state2, m2, _ = multi_step(state2, stacked, rng)
        _sync(m2["loss"])
        dt8 = time.perf_counter() - t0
        emit(f"train{suffix}_k8_videos_per_s",
             round(BATCH * K * n_disp / dt8, 3))
        emit(f"train{suffix}_k8_step_ms", round(1000 * dt8 / (K * n_disp), 2))
        return train_step, state

    state_for_cost = None
    with section("train_f32"):
        train_step32, state_for_cost = run_train(model, "")
    with section("train_bf16"):
        if budget_left() > 180:
            run_train(model16, "_bf16")
        else:
            emit("train_bf16_skipped", "budget")

    # MFU: XLA-reported FLOPs per train step / step time / peak. TPU v5e
    # peak is 197 TFLOP/s bf16. Reported against BOTH the single-dispatch
    # wall time and the k8 device-time proxy.
    with section("mfu"):
        if state_for_cost is not None:
            lowered = jax.jit(train_step32).lower(state_for_cost,
                                                  dev_batches[0], rng)
            cost = lowered.compile().cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            flops = float(cost.get("flops", 0.0))
            if flops > 0:
                emit("train_flops_per_step", flops)
                emit("train_mfu_pct", round(
                    100 * flops / (ROWS["train_step_ms"] / 1000) / 197e12, 2))
                emit("train_mfu_device_pct", round(
                    100 * flops / (ROWS["train_k8_step_ms"] / 1000) / 197e12,
                    2))
                if "train_bf16_k8_step_ms" in ROWS:
                    emit("train_bf16_mfu_device_pct", round(
                        100 * flops / (ROWS["train_bf16_k8_step_ms"] / 1000)
                        / 197e12, 2))

    finalize(partial=False)


if __name__ == "__main__":
    main()
