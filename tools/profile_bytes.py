"""Attribute the train step's HBM bytes to individual HLO instructions.

PERF.md establishes the train step is memory-bound: its roofline ceiling is
set by bytes touched, not FLOPs. This tool answers "which bytes?" — it
compiles the flagship train step, walks the *optimized* HLO entry
computation, and charges each top-level instruction out_bytes + operand
bytes (the post-fusion HBM traffic XLA's cost model counts). Output:

  - top-N instructions by bytes, with jax `op_name` metadata (source path)
  - totals grouped by opcode and by dtype (spots f32 leaks in a bf16 trunk)

Approximation notes: constants/iota are free in HBM terms only if fused —
they appear here if they survive as top-level instructions; while-loop
bodies (the decode/dispatch scans) are charged per *trip* via --scan-trips
multipliers when the loop name matches; tuples are skipped (no data).

Usage: python tools/profile_bytes.py [--batch 16] [--dtype bfloat16] [--top 40]
"""

from __future__ import annotations

import argparse
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_SHAPE_RE = re.compile(r"(?:([a-z0-9]+)\[([0-9,]*)\])")
_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "f16": 2, "bf16": 2, "f8e4m3fn": 1, "f8e5m2": 1,
    "s64": 8, "s32": 4, "s16": 2, "s8": 1,
    "u64": 8, "u32": 4, "u16": 2, "u8": 1, "pred": 1,
}


def shape_bytes(sig: str) -> tuple[int, dict[str, int]]:
    """Total bytes and per-dtype bytes for an HLO shape signature string.

    Handles tuples by summing every array shape found in the string."""
    total = 0
    per = defaultdict(int)
    for dt, dims in _SHAPE_RE.findall(sig):
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        b = n * _DTYPE_BYTES[dt]
        total += b
        per[dt] += b
    return total, per


_INSTR_RE = re.compile(
    r"^\s+(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*((?:\([^=]*?\)|[a-z0-9]+\[[0-9,]*\][^ ]*))\s+"
    r"([\w\-]+)\((.*)$"
)
_OPERAND_RE = re.compile(r"%?([\w.\-]+)")
_OPNAME_RE = re.compile(r'op_name="([^"]+)"')


def parse_entry(hlo_text: str):
    """Yield (name, out_shape_sig, opcode, operand_names, op_name) for the
    ENTRY computation's instructions."""
    lines = hlo_text.splitlines()
    in_entry = False
    depth = 0
    for ln in lines:
        if ln.startswith("ENTRY "):
            in_entry = True
            depth = ln.count("{") - ln.count("}")
            continue
        if not in_entry:
            continue
        depth += ln.count("{") - ln.count("}")
        if depth <= 0 and ("}" in ln):
            break
        m = _INSTR_RE.match(ln)
        if not m:
            continue
        name, sig, opcode, rest = m.groups()
        # operand list = everything up to the matching close paren; operands
        # are %refs — constants/literals contribute no named refs
        par = 0
        end = len(rest)
        for i, ch in enumerate(rest):
            if ch == "(":
                par += 1
            elif ch == ")":
                if par == 0:
                    end = i
                    break
                par -= 1
        operands = _OPERAND_RE.findall(rest[:end])
        onm = _OPNAME_RE.search(rest)
        yield name, sig, opcode, operands, (onm.group(1) if onm else "")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--dtype", default="bfloat16", choices=["float32", "bfloat16"])
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--stage", default="train",
                   choices=["train", "fwd_bwd", "greedy"])
    p.add_argument("--msda-backend", default="",
                   help="override cfg.msda_backend (matmul | matmul_acc | gather | pallas)")
    args = p.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/mfl_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from __graft_entry__ import _flagship_cfg
    from bench import real_batches, real_vocab_size
    from multimodal_feature_learning_tpu.engine.state import (
        create_train_state, make_optimizer,
    )
    from multimodal_feature_learning_tpu.engine.train import make_train_step
    from multimodal_feature_learning_tpu.models.criterion import (
        SetCriterion, build_weight_dict,
    )
    from multimodal_feature_learning_tpu.models.dvc import build_model

    cfg = _flagship_cfg(batch_size=args.batch)
    cfg.compute_dtype = args.dtype
    if args.msda_backend:
        cfg.msda_backend = args.msda_backend
    vocab_size = real_vocab_size()
    model = build_model(cfg, vocab_size)
    batch = real_batches(cfg, vocab_size, n_batches=1)[0]
    params = model.init(jax.random.PRNGKey(0), batch)

    weight_dict = build_weight_dict(cfg)
    criterion = SetCriterion(
        num_classes=cfg.dvc.num_classes, weight_dict=weight_dict,
        losses=list(cfg.dvc.losses), pad_idx=1, smoothing=cfg.dvc.smoothing,
    )

    if args.stage == "train":
        tx = make_optimizer(cfg, steps_per_epoch=100)
        state = create_train_state(params, tx)
        step = make_train_step(model, criterion, weight_dict, tx)
        lowered = step.lower(state, batch, jax.random.PRNGKey(1))
    elif args.stage == "fwd_bwd":
        def loss_fn(params, batch, rng):
            out, indices, indices_aux, mm = model.forward_train(params, batch, rng)
            losses = criterion(out, batch, indices, indices_aux, mm)
            return sum(losses[k] * weight_dict[k] for k in losses if k in weight_dict)

        lowered = jax.jit(jax.grad(loss_fn)).lower(
            params, batch, jax.random.PRNGKey(0))
    else:
        lowered = jax.jit(
            lambda p, b: model.forward_eval(p, b, "serve")[1]
        ).lower(params, batch)

    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    print(f"# stage={args.stage} B={args.batch} dtype={args.dtype} "
          f"cost_analysis: flops={ca.get('flops', 0)/1e9:.1f} GF, "
          f"bytes={ca.get('bytes accessed', 0)/1e9:.2f} GB")

    text = compiled.as_text()
    # shape table over ALL computations (operands may only be resolvable by
    # name; entry-level operands are entry-level instrs, but be permissive)
    shapes: dict[str, str] = {}
    for m in re.finditer(
            r"^\s+(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*((?:\([^=]*?\)|[a-z0-9]+\[[0-9,]*\][^ ]*))\s",
            text, re.M):
        shapes[m.group(1)] = m.group(2)

    rows = []
    by_opcode = defaultdict(int)
    by_dtype = defaultdict(int)
    copies_by_shape = defaultdict(lambda: [0, 0])  # shape -> [count, bytes]
    grand = 0
    for name, sig, opcode, operands, op_name in parse_entry(text):
        if opcode in ("tuple", "get-tuple-element", "parameter", "constant",
                      "bitcast"):
            continue
        b, per = shape_bytes(sig)
        for o in operands:
            osig = shapes.get(o)
            if osig:
                ob, oper = shape_bytes(osig)
                b += ob
                for k, v in oper.items():
                    per[k] += v
        rows.append((b, name, opcode, op_name, sig))
        by_opcode[opcode] += b
        for k, v in per.items():
            by_dtype[k] += v
        if opcode in ("copy", "copy-start", "copy-done") or "slice" in opcode:
            key = sig.split()[0][:70]
            copies_by_shape[key][0] += 1
            copies_by_shape[key][1] += b
        grand += b

    print(f"# entry-level instructions: {len(rows)}, "
          f"summed (out+operand) bytes: {grand/1e9:.2f} GB "
          f"(while-loop bodies counted once, not per trip)\n")

    print("## by dtype")
    for k, v in sorted(by_dtype.items(), key=lambda kv: -kv[1]):
        print(f"  {k:6s} {v/1e9:8.3f} GB  ({100*v/max(grand,1):.1f}%)")

    print("\n## by opcode")
    for k, v in sorted(by_opcode.items(), key=lambda kv: -kv[1])[:15]:
        print(f"  {k:24s} {v/1e9:8.3f} GB")

    print("\n## copies / slices by output shape (count, total bytes)")
    for k, (n, v) in sorted(copies_by_shape.items(), key=lambda kv: -kv[1][1])[:12]:
        print(f"  {v/1e9:8.3f} GB  x{n:<4d} {k}")

    print(f"\n## top {args.top} instructions by (out + operand) bytes")
    rows.sort(key=lambda r: -r[0])
    for b, name, opcode, op_name, sig in rows[:args.top]:
        tag = op_name
        if len(tag) > 80:
            tag = "…" + tag[-79:]
        print(f"  {b/1e6:9.1f} MB  {opcode:16s} {sig.split()[0][:44]:44s} {tag}")


if __name__ == "__main__":
    main()
