"""Training loop: jitted train step + epoch driver.

Behavioral spec: reference ``engine.py:26-155`` — forward, weighted loss sum,
NaN guard, grad clip, optimizer step, windowed metric logging.  The whole
step (forward incl. Hungarian matching, losses, backward, update) is ONE
jitted XLA program over the mesh-sharded global batch; the loss dict that the
reference all_reduces for logging comes out already globally reduced.
"""

from __future__ import annotations

import math
import sys
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.loader import split_batch
from ..parallel.mesh import shard_batch
from .logging import MetricLogger, SmoothedValue
from .state import TrainState


def _make_step_body(model, criterion, weight_dict: Dict[str, float], tx, lr_schedule=None):
    """The un-jitted (state, batch, rng) -> (state, metrics, grad_leaf_norms)
    step body shared by the single-step and scan-of-K-steps programs."""

    def loss_fn(params, batch, rng):
        out, indices, indices_aux, memory_mask = model.forward_train(params, batch, rng)
        losses = criterion(out, batch, indices, indices_aux, memory_mask)
        total = sum(losses[k] * weight_dict[k] for k in losses if k in weight_dict)
        return total, losses

    def train_step(state: TrainState, batch, rng):
        # accept bf16-TRANSFERRED batches (cfg.transfer_dtype: floats are cast
        # to bf16 on host to halve bytes over the host->device link, the
        # dominant cost when the host drives a remote chip) — upcast at entry
        # so everything downstream is unchanged; no-op for f32 batches
        batch = jax.tree_util.tree_map(
            lambda v: v.astype(jnp.float32)
            if v.dtype == jnp.bfloat16 else v, batch
        )
        rng = jax.random.fold_in(rng, state.step)
        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=params, opt_state=opt_state)
        metrics = dict(losses)
        metrics["loss"] = total
        metrics["grad_norm"] = optax.global_norm(grads)
        if lr_schedule is not None:
            metrics["lr"] = lr_schedule(state.step)
        # per-leaf grad norms for grad-flow diagnostics (reference plots.py):
        # a pytree of scalars, negligible output cost inside the jitted step
        grad_leaf_norms = jax.tree_util.tree_map(
            lambda g: jnp.sqrt(jnp.sum(g.astype(jnp.float32) ** 2)), grads
        )
        return new_state, metrics, grad_leaf_norms

    return train_step


def make_train_step(model, criterion, weight_dict: Dict[str, float], tx, lr_schedule=None):
    """Returns jitted (state, batch_arrays, rng) -> (state, metrics)."""
    return jax.jit(
        _make_step_body(model, criterion, weight_dict, tx, lr_schedule),
        donate_argnums=(0,),
    )


def make_train_multistep(model, criterion, weight_dict: Dict[str, float], tx,
                         lr_schedule=None, unroll: int = 1):
    """K optimizer steps per host dispatch: ``lax.scan`` of the train-step
    body over a stacked batch pytree (leaves (K, B, ...), K static per
    compile). One XLA program per K steps means K× fewer host round-trips —
    the dominant per-step overhead when the host drives a remote chip
    (dispatch tunnels) and a real reduction anywhere. ``unroll`` trades
    compile time for removing the while-loop carry (unroll=K fully inlines
    the K steps). Returns jitted (state, stacked_batches, rng) ->
    (state, metrics (K,) pytree, last-step grad_leaf_norms)."""
    body = _make_step_body(model, criterion, weight_dict, tx, lr_schedule)

    def multi(state: TrainState, batches, rng):
        def scan_body(st, batch):
            st, metrics, grad_leaf_norms = body(st, batch, rng)
            return st, (metrics, grad_leaf_norms)

        state, (metrics, grad_leaf_norms) = jax.lax.scan(
            scan_body, state, batches, unroll=unroll
        )
        last_norms = jax.tree_util.tree_map(lambda x: x[-1], grad_leaf_norms)
        return state, metrics, last_norms

    return jax.jit(multi, donate_argnums=(0,))


def train_one_epoch(
    model,
    criterion,
    weight_dict,
    train_step,
    state: TrainState,
    loader,
    mesh,
    rng,
    epoch: int,
    print_freq: int = 10,
    grad_flow_dir: str = "",
    grad_flow_freq: int = 100,
    step_logger=None,
    multi_step=None,
    chunk_k: int = 1,
    transfer_dtype=None,
):
    metric_logger = MetricLogger()
    metric_logger.add_meter("lr", SmoothedValue(window_size=1, fmt="{value:.6f}"))
    header = f"Epoch: [{epoch}]"

    def consume(metrics, grad_leaf_norms, step_in_epoch, global_step):
        """Host-side bookkeeping for one completed step (ONE device_get for
        the whole metrics dict: per-key float() costs a full tunnel
        round-trip each on the axon platform)."""
        metrics = jax.device_get(metrics)

        if grad_flow_dir and grad_leaf_norms is not None:
            # grad-flow diagnostics every N batches (reference engine.py:109-129)
            import json as _json
            import os as _os

            flat = jax.tree_util.tree_flatten_with_path(grad_leaf_norms)[0]
            stats = {
                "/".join(str(getattr(k, "key", k)) for k in path): float(v)
                for path, v in flat
            }
            _os.makedirs(grad_flow_dir, exist_ok=True)
            with open(
                _os.path.join(grad_flow_dir, f"grads_e{epoch:03d}_s{step_in_epoch:05d}.json"),
                "w",
            ) as f:
                _json.dump(stats, f)

        loss_value = float(metrics["loss"])
        if not math.isfinite(loss_value):
            # consume_many replays a chunk's K metric sets in step order, so
            # this names the FIRST non-finite step even under chunk_k > 1
            # (the optimizer may have advanced up to 2K-1 steps past it)
            print(
                f"Loss is {loss_value} at epoch {epoch} step {step_in_epoch} "
                f"(global {global_step}), stopping training"
            )
            print({k: float(v) for k, v in metrics.items()})
            sys.exit(1)

        log = {
            k: float(v)
            for k, v in metrics.items()
            if "_0" not in k and "_1" not in k and "_2" not in k
            and "_3" not in k and "_4" not in k and "_enc_" not in k
        }
        metric_logger.update(**log)
        if step_logger is not None:
            # per-step metric stream (reference engine.py:299-314 wandb logging)
            step_logger(log, global_step)

    def consume_many(metrics_k, grad_leaf_norms, first_step_in_epoch, first_global):
        """Split a (K,)-leading metrics pytree from one multi-step dispatch
        into K per-step consume() calls (one host transfer for all K).

        multi_step returns grad-leaf norms for the chunk's LAST step only;
        when the chunk spans a grad_flow_freq multiple the dump is attributed
        to that last step (chunk granularity), never mislabeled onto earlier
        steps."""
        metrics_k = jax.device_get(metrics_k)
        K = len(jax.tree_util.tree_leaves(metrics_k)[0])
        spans_dump = (first_step_in_epoch + K - 1) // grad_flow_freq \
            > (first_step_in_epoch - 1) // grad_flow_freq
        for j in range(K):
            m = jax.tree_util.tree_map(lambda x: x[j], metrics_k)
            consume(m, grad_leaf_norms if (j == K - 1 and spans_dump) else None,
                    first_step_in_epoch + j, first_global + j)

    # pipelined metric fetch: the host transfer of step i-1's metrics happens
    # AFTER step i is dispatched, so it overlaps device compute instead of
    # serializing the tunnel round-trip into every step. The NaN guard
    # therefore fires with a one-step lag at chunk_k == 1 (one extra harmless
    # step vs reference engine.py:101-104); with chunk_k = K > 1 the lag is
    # up to 2K-1 optimizer steps (the NaN chunk's remaining steps plus the
    # already-dispatched next chunk) — steps after a NaN only burn compute,
    # the abort still precedes any checkpoint write. With chunk_k > 1, K
    # optimizer steps run per dispatch (lax.scan inside one XLA program) and
    # the final ragged remainder falls back to single-step dispatches.
    step_in_epoch = 0
    pending = None
    chunk = []
    global_step0 = int(state.step)  # one sync before the loop, then host-side
    use_chunks = chunk_k > 1 and multi_step is not None
    for batch in metric_logger.log_every(loader, print_freq, header):
        arrays, _meta = split_batch(batch)
        if use_chunks:
            chunk.append(arrays)
            if len(chunk) < chunk_k:
                continue
            stacked = shard_batch(
                {k: np.stack([c[k] for c in chunk]) for k in chunk[0]},
                mesh, stacked=True, float_dtype=transfer_dtype,
            )
            chunk = []
            state, metrics_k, grad_leaf_norms = multi_step(state, stacked, rng)
            if pending is not None:
                pending[0](*pending[1])
            pending = (consume_many,
                       (metrics_k, grad_leaf_norms, step_in_epoch,
                        global_step0 + step_in_epoch + 1))
            step_in_epoch += chunk_k
        else:
            arrays = shard_batch(arrays, mesh, float_dtype=transfer_dtype)
            state, metrics, grad_leaf_norms = train_step(state, arrays, rng)
            if pending is not None:
                pending[0](*pending[1])
            if step_in_epoch % grad_flow_freq != 0:
                grad_leaf_norms = None
            pending = (consume,
                       (metrics, grad_leaf_norms, step_in_epoch,
                        global_step0 + step_in_epoch + 1))
            step_in_epoch += 1
    for arrays in chunk:  # ragged tail: fewer than chunk_k batches left
        arrays = shard_batch(arrays, mesh, float_dtype=transfer_dtype)
        state, metrics, grad_leaf_norms = train_step(state, arrays, rng)
        if pending is not None:
            pending[0](*pending[1])
        if step_in_epoch % grad_flow_freq != 0:
            grad_leaf_norms = None
        pending = (consume,
                   (metrics, grad_leaf_norms, step_in_epoch,
                    global_step0 + step_in_epoch + 1))
        step_in_epoch += 1
    if pending is not None:
        pending[0](*pending[1])

    print("Averaged stats:", metric_logger)
    stats = {k: meter.global_avg for k, meter in metric_logger.meters.items()}
    return state, stats
