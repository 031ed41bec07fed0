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


def create_train_state(params, tx: optax.GradientTransformation) -> TrainState:
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
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    target = None
    if abstract_state is not None:
        target = {
            "state": jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, abstract_state),
            "epoch": 0,
        }
    return ckptr.restore(os.path.abspath(path), target)
