"""Observability: gradient-flow diagnostics, profiling, device memory.

Behavioral spec: reference ``utils/plots.py:11-97`` (per-layer mean/max
gradient bar plots saved every 100 batches), ``utils/misc.py:94-98``
(gpu memory via nvidia-smi) and the MetricLogger timing meters.  TPU
equivalents: pytree grad stats (+ optional matplotlib bar plot),
``jax.profiler`` trace sections, and device memory_stats().
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Dict

import jax
import numpy as np


def grad_flow_stats(grads) -> Dict[str, Dict[str, float]]:
    """{param_path: {mean_abs, max_abs, norm}} over a gradient pytree."""
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    stats = {}
    for path, leaf in flat:
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        arr = np.abs(np.asarray(leaf))
        stats[name] = {
            "mean_abs": float(arr.mean()),
            "max_abs": float(arr.max()),
            "norm": float(np.linalg.norm(arr)),
        }
    return stats


def save_grad_flow(grads, out_dir: str, step: int, plot: bool = True):
    """Writes grad-flow stats as JSON (always) and a bar plot (if matplotlib
    is importable) — the reference's plot_grad_flow_bar_plot analog."""
    os.makedirs(out_dir, exist_ok=True)
    stats = grad_flow_stats(grads)
    with open(os.path.join(out_dir, f"grad_flow_{step:08d}.json"), "w") as f:
        json.dump(stats, f)
    if plot:
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            names = list(stats)
            means = [stats[n]["mean_abs"] for n in names]
            maxes = [stats[n]["max_abs"] for n in names]
            fig, ax = plt.subplots(figsize=(max(8, len(names) * 0.2), 6))
            xs = np.arange(len(names))
            ax.bar(xs, maxes, alpha=0.4, lw=1, color="c", label="max")
            ax.bar(xs, means, alpha=0.7, lw=1, color="b", label="mean")
            ax.set_xticks(xs)
            ax.set_xticklabels(names, rotation=90, fontsize=4)
            ax.set_yscale("log")
            ax.set_ylabel("|grad|")
            ax.legend()
            fig.tight_layout()
            fig.savefig(os.path.join(out_dir, f"grad_flow_{step:08d}.png"), dpi=150)
            plt.close(fig)
        except ImportError:
            pass
    return stats


@contextlib.contextmanager
def profile_section(name: str, log_dir: str = ""):
    """Timed (and optionally traced) section; wraps jax.profiler when a
    log_dir is given. Prints wall time on exit."""
    if log_dir:
        ctx = jax.profiler.trace(log_dir)
    else:
        ctx = contextlib.nullcontext()
    t0 = time.perf_counter()
    with ctx:
        yield
    print(f"[profile] {name}: {time.perf_counter() - t0:.3f}s", flush=True)


def device_memory_stats() -> Dict:
    """Per-device memory stats (bytes_in_use etc.) where the backend exposes
    them — the avail_mem_gpu.py / max_memory_allocated analog."""
    out = {}
    for d in jax.local_devices():
        try:
            out[str(d)] = d.memory_stats()
        except Exception:
            out[str(d)] = None
    return out
