"""Train state, optimizer, LR schedule, checkpointing.

Behavioral spec: reference main.py — AdamW(lr 1e-4, wd 1e-4) + StepLR(drop 40
epochs, gamma 0.1) (main.py:95-99 via config), global-norm grad clip 0.1
(engine.py:131-132), checkpoint dict {model, optimizer, lr_scheduler, epoch}
written every epoch + archival copies (main.py:101-141).  TPU equivalents:
optax chain (clip_by_global_norm -> adamw with stepped schedule) and orbax
checkpointing of the state pytree.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import flax
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any


def make_lr_schedule(base_lr: float, lr_drop_epochs: int, steps_per_epoch: int):
    """StepLR semantics: lr * 0.1 ** (epoch // lr_drop); lr_drop <= 0 means
    a constant lr (matches eval_rate/checkpoint_rate rate-0 semantics)."""
    if lr_drop_epochs <= 0:
        return lambda step: base_lr

    def schedule(step):
        epoch = step // max(steps_per_epoch, 1)
        return base_lr * jnp.power(0.1, epoch // lr_drop_epochs)

    return schedule


def make_optimizer(cfg, steps_per_epoch: int) -> optax.GradientTransformation:
    schedule = make_lr_schedule(cfg.lr, cfg.lr_drop, steps_per_epoch)
    return optax.chain(
        optax.clip_by_global_norm(cfg.clip_max_norm),
        optax.adamw(learning_rate=schedule, weight_decay=cfg.weight_decay),
    )


def create_train_state(params, tx: optax.GradientTransformation,
                       master_dtype=None) -> TrainState:
    """master_dtype="bfloat16" FOLDS the f32 master copy: params (and the
    adam moments tx.init derives from them) live in bf16 — shaves ~15% of
    the train step's weight-side HBM bytes (PERF.md byte attribution) at an
    update-precision cost. Flag-gated, default f32 masters
    (cfg.master_dtype; measured in PERF.md "f32-master fold")."""
    if master_dtype is not None and jnp.dtype(master_dtype) != jnp.float32:
        dt = jnp.dtype(master_dtype)
        params = jax.tree.map(
            lambda a: a.astype(dt)
            if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating) else a,
            params,
        )
    return TrainState(
        step=jnp.zeros((), dtype=jnp.int32),
        params=params,
        opt_state=tx.init(params),
    )


# -- checkpointing (orbax) ------------------------------------------------------


def _ckptr():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save_checkpoint(output_dir: str, state: TrainState, epoch: int, name: str = "checkpoint"):
    """Rank-0 gated like save_on_master (utils/misc.py:431-433)."""
    if jax.process_index() != 0:
        return None
    path = os.path.abspath(os.path.join(output_dir, name))
    ckptr = _ckptr()
    payload = {"state": jax.device_get(state), "epoch": epoch}
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    return path


def load_checkpoint(path: str, abstract_state: Optional[TrainState] = None) -> Dict:
    """Restore a checkpoint onto `abstract_state`'s structure.

    master_dtype may differ across save/resume (an f32-master checkpoint
    resumed with cfg.master_dtype="bfloat16", or vice versa): the first
    restore attempt uses the requested dtypes; if orbax rejects the
    mismatched template, the checkpoint is restored with the OTHER master
    dtype's template and then cast onto the requested one — i.e. the fold
    (or unfold) applies after restore instead of failing the resume."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    if abstract_state is None:
        return ckptr.restore(os.path.abspath(path))
    target = {
        "state": jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, abstract_state),
        "epoch": 0,
    }
    try:
        return ckptr.restore(os.path.abspath(path), target)
    except Exception as first_err:  # noqa: BLE001 — retry flipped master dtype
        def _flip(t):
            if not hasattr(t, "dtype") or not jnp.issubdtype(t.dtype, jnp.floating):
                return t
            alt = jnp.bfloat16 if t.dtype == jnp.dtype(jnp.float32) else jnp.float32
            return jax.ShapeDtypeStruct(t.shape, alt)

        alt_target = jax.tree_util.tree_map(_flip, target)
        try:
            restored = ckptr.restore(os.path.abspath(path), alt_target)
        except Exception:  # noqa: BLE001
            # not a master-dtype mismatch (e.g. a structural template
            # mismatch): surface the ORIGINAL error, not the retry's
            raise first_err from None

        def _cast(t, v):
            if hasattr(t, "dtype") and jnp.issubdtype(
                    getattr(t, "dtype", jnp.int32), jnp.floating):
                return jnp.asarray(v).astype(t.dtype)
            return v

        return jax.tree_util.tree_map(_cast, target, restored)


def shard_state(state: TrainState, mesh, tp_axis: Optional[str] = None) -> TrainState:
    """Place a (host) TrainState onto `mesh` — the checkpoint-resharding hook.

    Checkpoints are mesh-agnostic host pytrees (save_checkpoint device_gets
    before writing), so a run saved under one topology resumes under any
    other: save on DP8, restore on DP4xTP2 or a single device by loading the
    host state and re-placing it here. With ``tp_axis`` the params AND the
    matching adamw mu/nu moments get Megatron-style TP specs (the path-suffix
    rules in parallel/tp.py apply to the moment subtrees verbatim because
    optax mirrors the param tree); otherwise everything replicates.

    Reference analog: resume semantics main.py:101-108, which only ever knew
    one topology (DDP) — this is the mesh-general version.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    if mesh.size == 1:
        dev = mesh.devices.reshape(-1)[0]
        return jax.device_put(state, dev)
    if tp_axis is None:
        return jax.device_put(state, NamedSharding(mesh, P()))
    from ..parallel.tp import _leaf_spec

    specs = jax.tree_util.tree_map_with_path(
        lambda p, v: _leaf_spec(p, v, tp_axis), state)
    return jax.tree_util.tree_map(
        lambda v, s: jax.device_put(v, NamedSharding(mesh, s)), state, specs)
