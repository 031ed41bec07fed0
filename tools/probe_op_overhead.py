"""Per-op / per-Pallas-launch overhead floor on the real chip.

Times a scan of N trivial ops entirely on-device (one program, no dispatch
noise): (a) XLA elementwise add, (b) small XLA matmul at decode shapes,
(c) a minimal Pallas kernel, (d) a decode-shaped cross-attention op
sequence. The per-iteration delta between scan lengths isolates the
marginal per-op cost.

Measured 2026-08-19 (v5e, two runs): xla_add / pallas launch / 160x512x512
MXU matmul all within the estimator's ±1-3 us noise band of ZERO marginal
cost; the decode-shaped cross-attention sequence reproduces at 4.2-4.7 us
with loop-invariant K/V (XLA keeps the 18.5 MB K/V VMEM-resident across
scan steps when it fits). Conclusion: per-op launch overhead inside a
compiled program is NOT where the decode's 0.111 ms/token/layer goes — see
PERF.md for the corrected memory-traffic attribution.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[0]))


def time_scan(body, x, length, reps=3, iters=10):
    @jax.jit
    def run(x):
        def step(c, _):
            return body(c), None
        c, _ = jax.lax.scan(step, x, None, length=length)
        return c

    _sync(run(x))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = run(x)
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def per_op_us(body, x, n1=64, n2=512):
    t1 = time_scan(body, x, n1)
    t2 = time_scan(body, x, n2)
    return 1e6 * (t2 - t1) / (n2 - n1)


def add_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...] + 1.0


def pallas_add(x):
    return pl.pallas_call(
        add_kernel, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype)
    )(x)


def main():
    x_small = jnp.zeros((160, 64), jnp.bfloat16)   # decode-activation sized
    w = jnp.zeros((512, 512), jnp.bfloat16)
    q = jnp.zeros((160, 512), jnp.bfloat16)

    rows = {}
    rows["xla_add_us_per_op"] = round(per_op_us(lambda c: c + 1.0, x_small), 2)
    rows["pallas_add_us_per_launch"] = round(
        per_op_us(pallas_add, x_small), 2)

    def mm(c):
        return jnp.tanh(c @ w)  # tanh keeps scan from folding to one matmul

    rows["xla_matmul160x512x512_us_per_op"] = round(per_op_us(mm, q), 2)

    # a decode-shaped cross-attention logits+softmax+weighted-sum op sequence
    K = jnp.zeros((16, 8, 563, 64), jnp.bfloat16)
    V = jnp.zeros((16, 8, 563, 64), jnp.bfloat16)

    def xattn(c):  # c: (16, 8, 10, 64)
        logits = jnp.einsum("bhqd,bhkd->bhqk", c, K).astype(jnp.float32)
        attn = jax.nn.softmax(logits * 0.125, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn.astype(V.dtype), V)
        return jnp.tanh(out)

    cq = jnp.zeros((16, 8, 10, 64), jnp.bfloat16)
    rows["xla_xattn_563keys_us_per_seq"] = round(per_op_us(xattn, cq), 2)

    for k, v in rows.items():
        print(f"{k}: {v}")


if __name__ == "__main__":
    main()
