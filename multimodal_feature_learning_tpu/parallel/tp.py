"""Tensor-parallel parameter sharding over the mesh 'model' axis.

The reference has no TP (its only strategy is DDP, SURVEY §2.5); this is the
TPU-native capability the mesh plumbing was kept general for: Megatron-style
column/row sharding of the transformer FFN pairs, the vanilla-attention
q/k/v/out projections, and the caption vocab head, expressed purely as
``NamedSharding`` placement of the parameter pytree — GSPMD propagates the
layouts through the jitted step and inserts the ICI collectives (an
all-reduce after each row-parallel matmul, an all-gather where a replicated
consumer needs the full activation). No model code changes: semantics are
identical to the replicated run (pinned by tests/test_sharding.py).

Rules (matched on the last two path components of each leaf):

  column-parallel (output features split over 'model'):
    linear1, fully_connected_1 (FFN up-proj), q/k/v_linear (head dim),
    head (caption vocab logits)            kernel P(None, ax), bias P(ax)
  row-parallel (input features split, partial sums all-reduced):
    linear2, fully_connected_2 (FFN down-proj), projection_layer
    (attention out-proj)                   kernel P(ax, None), bias P()
  everything else (norms, embeddings, MSDA sampling/value/output projections,
  small heads): replicated P().

MSDA's own projections stay replicated deliberately — their interior
(B, S, H, D/H) gather layout reshards awkwardly and they are a tiny fraction
of the FLOPs; the deformable encoder instead scales via token-axis SP
(models/dvc.py ``shard_tokens_axis``), which composes with this TP (the two
live on the same 'model' axis and apply to disjoint tensors).

Known inefficiency: under DPxTP the caption decoder's cross-attention reshape
triggers an SPMD "involuntary full rematerialization" warning (GSPMD can't go
from batch-sharded to head-sharded layout without a replicate step on that
reshape). Semantics are unaffected (equivalence pinned by the tests); at this
model scale TP is a capability demonstration — DP(+SP) is the production
layout — so the extra all-gather is accepted rather than hand-annotating the
decoder interior.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_COL = ("linear1", "fully_connected_1", "q_linear", "k_linear", "v_linear",
        "head")
_ROW = ("linear2", "fully_connected_2", "projection_layer")


def _leaf_spec(path, leaf, ax: str) -> P:
    parts = [str(getattr(k, "key", k)) for k in path]
    if len(parts) < 2 or leaf.ndim == 0:
        return P()
    module, name = parts[-2], parts[-1]
    if module in _COL:
        if name == "kernel" and leaf.ndim == 2:
            return P(None, ax)
        if name == "bias" and leaf.ndim == 1:
            return P(ax)
    if module in _ROW and name == "kernel" and leaf.ndim == 2:
        return P(ax, None)
    return P()


def tp_param_specs(params, axis: str = "model"):
    """PartitionSpec pytree for `params` under the rules above."""
    return jax.tree_util.tree_map_with_path(
        lambda p, v: _leaf_spec(p, v, axis), params)


def shard_params_tp(params, mesh: Mesh, axis: str = "model"):
    """device_put the param tree with TP shardings (replicate non-matching)."""
    specs = tp_param_specs(params, axis)
    return jax.tree_util.tree_map(
        lambda v, s: jax.device_put(v, NamedSharding(mesh, s)), params, specs)
