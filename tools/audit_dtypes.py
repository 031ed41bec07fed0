"""Mixed-precision audit: which matmuls/convs run in which dtype?

Lowers the jitted train step (or serve-mode inference) to StableHLO and
tallies every ``dot_general`` / ``convolution`` by operand element type.
A single f32 tensor leaking into a bf16 trunk silently re-promotes every
downstream matmul to f32 (flax Dense with dtype=None follows input/param
promotion), so after any model change run:

    python tools/audit_dtypes.py --dtype bfloat16 [--small] [--infer]

and check that the biggest dots are bf16.  The remaining f32 dots should all
be deliberate: loss/criterion math, segment heads, the context-mask MLP on
its f32 (denorm ++ query) input, log_softmax producers.
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def collect_dots(mlir_text: str):
    """Yield (op, [operand element types], [operand shapes], line) tuples."""
    pat = re.compile(r"tensor<([0-9x]*)x?(bf16|f16|f32|f64|i\d+|ui\d+)>")
    for line in mlir_text.splitlines():
        if "dot_general" in line or "stablehlo.convolution" in line:
            ts = pat.findall(line)
            if not ts:
                continue
            shapes = [tuple(int(d) for d in s.split("x") if d) for s, _ in ts]
            dtypes = [t for _, t in ts]
            op = "dot" if "dot_general" in line else "conv"
            yield op, dtypes, shapes, line.strip()


def size_proxy(shapes):
    """Ranking proxy: the largest tensor touched by the op."""
    return max((int(__import__("math").prod(s)) if s else 1) for s in shapes)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--small", action="store_true",
                    help="small test config (fast, CPU lowering)")
    ap.add_argument("--infer", action="store_true",
                    help="audit serve-mode inference instead of the train step")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    jax.config.update("jax_platforms", "cpu")

    if args.small:
        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
        from test_model_forward import small_cfg, synthetic_batch

        cfg = small_cfg()
        cfg.compute_dtype = args.dtype
        cfg.batch_size = 2
        batch = synthetic_batch(cfg)
        vocab_size = 60
    else:
        from __graft_entry__ import _flagship_cfg, _synth_batch

        cfg = _flagship_cfg(batch_size=4)
        cfg.compute_dtype = args.dtype
        vocab_size = 600
        batch = _synth_batch(cfg, 4, vocab_size, seed=0)

    from multimodal_feature_learning_tpu.engine.state import (
        create_train_state, make_optimizer,
    )
    from multimodal_feature_learning_tpu.engine.train import make_train_step
    from multimodal_feature_learning_tpu.models.criterion import (
        SetCriterion, build_weight_dict,
    )
    from multimodal_feature_learning_tpu.models.dvc import build_model

    model = build_model(cfg, vocab_size)
    params = model.init(jax.random.PRNGKey(0), batch)

    if args.infer:
        fn = jax.jit(lambda p, b: model.forward_eval(p, b, "serve")[1])
        lowered = fn.lower(params, batch)
    else:
        weight_dict = build_weight_dict(cfg)
        criterion = SetCriterion(
            num_classes=cfg.dvc.num_classes, weight_dict=weight_dict,
            losses=list(cfg.dvc.losses), pad_idx=1, smoothing=cfg.dvc.smoothing,
        )
        tx = make_optimizer(cfg, steps_per_epoch=100)
        state = create_train_state(params, tx)
        step = make_train_step(model, criterion, weight_dict, tx)
        lowered = step.lower(state, batch, jax.random.PRNGKey(1))

    text = lowered.as_text()
    dots = list(collect_dots(text))
    by_dtype = {}
    for op, dtypes, shapes, line in dots:
        key = "/".join(sorted(set(d for d in dtypes)))
        by_dtype.setdefault(key, []).append((size_proxy(shapes), op, shapes))

    print(f"== {len(dots)} dot/conv ops "
          f"({'infer' if args.infer else 'train step'}, "
          f"compute_dtype={args.dtype}) ==")
    for key, items in sorted(by_dtype.items()):
        total = sum(s for s, _, _ in items)
        print(f"  {key:14s}: {len(items):4d} ops, size-proxy {total:.3e}")

    mixed_or_f32 = [
        (s, op, shapes)
        for key, items in by_dtype.items() if "f32" in key
        for (s, op, shapes) in items
    ]
    mixed_or_f32.sort(reverse=True)
    print(f"\n-- top {args.top} ops touching f32 (largest first) --")
    for s, op, shapes in mixed_or_f32[: args.top]:
        print(f"  {s:>12d}  {op}  {shapes}")


if __name__ == "__main__":
    main()
