"""Serving load-test sweep: static micro-batching vs slot-refill continuous
batching, on-chip, same weights (VERDICT r4 item 3).

Drives `serve.py` (one subprocess per point, so each server starts clean and
compiles its own programs — all cached after the first run) across:
  * mode: static | continuous with chunk in {2, 4, 8}
  * offered Poisson load: 50 and 200 rps (the round-3 static capacity was
    ~41 rps, so 200 rps is deep overload — the regime slot-refill exists for)

and prints one JSON line per point plus a final markdown table for
COMPONENTS.md. The criterion from the verdict: does slot-refill cut tail
latency / raise sustained throughput under overload vs the static server?

Usage: python tools/load_test_serve.py [--n-requests 256] [--rps 50,200]
       [--chunks 2,4,8] [--extra --config-overrides ...]
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_point(mode_args, rps, n_requests, timeout_s=900):
    cmd = [sys.executable, os.path.join(REPO, "serve.py"),
           "--rps", str(rps), "--n-requests", str(n_requests)] + mode_args
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=timeout_s,
                       cwd=REPO)
    if r.returncode != 0:
        return {"error": r.stderr[-300:], "cmd": " ".join(cmd)}
    for line in reversed(r.stdout.strip().splitlines()):
        try:
            return json.loads(line)
        except json.JSONDecodeError:
            continue
    return {"error": "no JSON line", "cmd": " ".join(cmd)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-requests", type=int, default=256)
    ap.add_argument("--rps", default="50,200")
    ap.add_argument("--chunks", default="2,4,8")
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--timeout-s", type=int, default=900)
    ap.add_argument("--overrides", default="compute_dtype=bfloat16,use_differentiable_mask=false",
                    help="comma-separated cfg overrides forwarded to serve.py "
                         "(default: the production bf16 serving trunk)")
    ap.add_argument("--resume", default="runs/conv_e79/checkpoint",
                    help="checkpoint for every point (TRAINED weights matter: "
                         "untrained captions never emit <eos>, so every row "
                         "decodes to max length and slot-refill's advantage "
                         "— harvesting short captions early — is defined "
                         "away; '' = fresh init)")
    args = ap.parse_args()

    points = []
    extra = []
    if args.resume:
        extra += ["--resume", args.resume]
    if args.overrides:
        extra += ["--config-overrides"] + args.overrides.split(",")
    modes = [("static", ["--batch-size", str(args.batch_size)] + extra)]
    for c in args.chunks.split(","):
        modes.append((f"continuous_c{c}",
                      ["--continuous", "--chunk", c,
                       "--batch-size", str(args.batch_size)] + extra))
    for rps in args.rps.split(","):
        for name, margs in modes:
            res = run_point(margs, rps, args.n_requests, args.timeout_s)
            res["point"] = f"{name}@{rps}rps"
            points.append(res)
            print(json.dumps(res), flush=True)

    # markdown table
    print("\n| point | offered rps | sustained rps | p50 ms | p95 ms | p99 ms |"
          " mean fill | dispatches |", file=sys.stderr)
    print("|---|---|---|---|---|---|---|---|", file=sys.stderr)
    for r in points:
        if "error" in r:
            print(f"| {r.get('point','?')} | ERROR {r['error'][:80]} |",
                  file=sys.stderr)
            continue
        print(f"| {r['point']} | {r['offered_rps']} | {r['achieved_rps']} | "
              f"{r['latency_p50_ms']} | {r['latency_p95_ms']} | "
              f"{r['latency_p99_ms']} | {r.get('mean_batch_fill','-')} | "
              f"{r['dispatches']} |", file=sys.stderr)


if __name__ == "__main__":
    main()
