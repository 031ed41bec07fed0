"""Profile the MSDA backends (gather / matmul / pallas) at production shapes.

Decides the Pallas kernel's fate with data (VERDICT r1 #9): measures forward
and forward+backward wall time per backend on the real chip at the flagship
encoder shape (B16, S=563 over 4 levels, H8 Dh64 P4; Q=S self-attention) and
the decoder shape (Q=20 queries). Prints a markdown table to paste into
COMPONENTS.md.

Usage: python tools/profile_msda.py [--iters 50]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timed(fn, args, iters, inner):
    import time

    # float() = host transfer = HARD sync. jax.block_until_ready does not
    # actually wait on the axon tunnel platform (measured: constant wall time
    # regardless of device work). The TPU executes in order, so blocking on
    # each scalar result is correct and adds one RTT per dispatch, amortized
    # by `inner` kernel invocations per dispatch.
    float(fn(*args))  # compile
    t0 = time.perf_counter()
    acc = 0.0
    for _ in range(iters):
        acc += float(fn(*args))
    return (time.perf_counter() - t0) / (iters * inner) * 1e3


def bench_case(name, B, Q, H, Dh, shapes, P, iters):
    import jax
    import jax.numpy as jnp

    from multimodal_feature_learning_tpu.ops.ms_deform_attn import (
        ms_deform_attn_core,
    )

    S = sum(shapes)
    L = len(shapes)
    rng = np.random.default_rng(0)
    value = jnp.asarray(rng.normal(size=(B, S, H, Dh)).astype(np.float32))
    loc = jnp.asarray(rng.uniform(0, 1, size=(B, Q, H, L, P)).astype(np.float32))
    aw = rng.uniform(0, 1, size=(B, Q, H, L, P)).astype(np.float32)
    aw = jnp.asarray(aw / aw.sum(axis=(3, 4), keepdims=True))

    INNER = 20  # kernel invocations per dispatch: device-time, not dispatch-time

    rows = []
    for backend in ("gather", "matmul", "pallas"):

        def one(v, l, a):
            return ms_deform_attn_core(v, tuple(shapes), l, a, backend)

        @jax.jit
        def fwd_loop(v, l, a):
            # carry-dependent input defeats loop-invariant hoisting/CSE
            def body(c, _):
                # perturb LOC, not value: a scalar on value factors out of the
                # linear kernel and XLA hoists the whole matmul as invariant
                out = one(v, l + 1e-12 * c, a)
                return jnp.sum(out), None

            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=INNER)
            return c

        def loss(v, l, a):
            return jnp.sum(one(v, l, a) ** 2)

        @jax.jit
        def bwd_loop(v, l, a):
            def body(c, _):
                g = jax.grad(loss, argnums=(0, 1, 2))(v, l + 1e-12 * c, a)
                return jnp.sum(g[0]) + jnp.sum(g[1]) + jnp.sum(g[2]), None

            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=INNER)
            return c

        try:
            t_fwd = _timed(fwd_loop, (value, loc, aw), iters, INNER)
            t_bwd = _timed(bwd_loop, (value, loc, aw), iters, INNER)
            rows.append((backend, t_fwd, t_bwd))
        except Exception as e:  # e.g. pallas unsupported on this platform
            rows.append((backend, float("nan"), float("nan")))
            print(f"# {backend} failed: {type(e).__name__}: {e}", file=sys.stderr)

    print(f"\n### {name}  (B={B} Q={Q} H={H} Dh={Dh} S={S} L={L} P={P})\n")
    print("| backend | fwd ms | fwd+bwd ms |")
    print("|---|---|---|")
    for backend, f, fb in rows:
        print(f"| {backend} | {f:.3f} | {fb:.3f} |")
    return rows


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=50)
    args = p.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/mfl_jax_cache")
    print(f"# platform: {jax.default_backend()}  devices: {len(jax.devices())}")

    shapes = (300, 150, 75, 38)  # flagship pyramid at video_rescale_len=300
    # encoder self-attention: every (sparse-selected) token is a query;
    # rho=0.5 keeps ~282, but the XLA program is built at the padded S
    bench_case("encoder self-attn", 16, sum(shapes), 8, 64, shapes, 4, args.iters)
    # sparse top-rho query count
    bench_case("encoder sparse (rho=0.5)", 16, 282, 8, 64, shapes, 4, args.iters)
    # decoder cross-attention: 20 queries
    bench_case("decoder cross-attn", 16, 20, 8, 64, shapes, 4, args.iters)


if __name__ == "__main__":
    main()
