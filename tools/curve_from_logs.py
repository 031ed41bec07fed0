"""Extract the train-vs-val curve from the 80-epoch convergence run logs
(runs_conv_phase*.log) — the evidence behind the e09 caption-metric peak
(VERDICT r3 weak 3 / task 4).

Each log interleaves per-epoch "Epoch: [N] ... loss_caption: x (avg)" train
lines and "Eval scores: {...METEOR...}" val lines (eval runs right after the
epoch whose number precedes it). Phases overlap on resume (auto-resume
replays the checkpoint epoch), so later phases override earlier ones.

Prints a markdown table epoch -> (train loss, train loss_caption,
val METEOR, val CIDEr) for the epochs that ran eval.
"""

import ast
import glob
import re

EPOCH_RE = re.compile(
    r"Epoch: \[(\d+)\].*?loss: [\d.]+ \(([\d.]+)\).*?loss_caption: "
    r"[\d.]+ \(([\d.]+)\)")
EVAL_RE = re.compile(r"Eval scores: (\{.*\})")


def main():
    # epoch -> (train avg loss, train avg caption loss)  [last line of epoch]
    train = {}
    evals = {}  # epoch -> dict
    for path in sorted(glob.glob("runs_conv_phase*.log")):
        cur_epoch = None
        for line in open(path, errors="replace"):
            m = EPOCH_RE.search(line)
            if m:
                cur_epoch = int(m.group(1))
                train[cur_epoch] = (float(m.group(2)), float(m.group(3)))
                continue
            m = EVAL_RE.search(line)
            if m and cur_epoch is not None:
                evals[cur_epoch] = ast.literal_eval(m.group(1))

    print("| epoch | train loss | train loss_caption | val METEOR | val CIDEr |")
    print("|---|---|---|---|---|")
    for e in sorted(evals):
        tl, tc = train.get(e, (float("nan"), float("nan")))
        s = evals[e]
        print(f"| {e} | {tl:.2f} | {tc:.3f} | {s['METEOR']:.3f} "
              f"| {s['CIDEr']:.3f} |")


if __name__ == "__main__":
    main()
