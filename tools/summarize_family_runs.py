"""Summarize the family-convergence runs (tools/run_family_convergence.sh)
into FAMILIES.md: per-family loss trajectory (first/last epoch, % decrease)
and the periodic anet_eval score table (VERDICT r2 missing item 4 —
convergence + quality evidence for BASELINE configs #3 and #5).

Reads runs/<name>/train_log.txt (one JSON per epoch, train_* keys) and
val_log.txt (eval epochs, score_* keys) written by main.py.
"""

from __future__ import annotations

import json
import os

FAMILIES = [
    ("mm", "Feature video+audio MultimodalDVC + BiModalEncoder fusion "
           "(BASELINE config #3; sparse cross-modal encoder, "
           "dvc.use_bimodal_encoder=True)"),
    ("raw", "RawMultimodalDVC: synthetic decode -> ViViT + AST backbones -> "
            "cross-modal sparse DVC, beam-search eval "
            "(BASELINE configs #4+#5; reduced dims, see "
            "tools/run_family_convergence.sh)"),
    ("dense", "UnimodalDeformableDVC: dense deformable encoder (no top-rho "
              "sparsification) + class head + refinement "
              "(BASELINE config #2; dvc.use_sparse_detr=False, "
              "use_deformable_detr=True; tools/run_family_dense.sh)"),
    ("regular", "RegularDVC: vanilla cross-attention decoder over frame "
                "features, no multi-scale pyramid (both family flags False; "
                "tools/run_family_dense.sh)"),
]

SCORE_KEYS = ["Bleu_1", "Bleu_2", "METEOR", "ROUGE_L", "CIDEr",
              "Recall", "Precision"]


def read_jsonl(path):
    if not os.path.exists(path):
        return []
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    return rows


def existing_sections(path="FAMILIES.md"):
    """Prior FAMILIES.md section bodies keyed by family name, so a family
    whose runs/<name>/ dir was cleaned up (the convergence runs are run
    one-at-a-time and the dir reused) keeps its committed evidence instead
    of regressing to "_no run data found_"."""
    if not os.path.exists(path):
        return {}
    sections, name, body = {}, None, []
    with open(path) as f:
        for line in f:
            if line.startswith("## "):
                if name is not None:
                    sections[name] = "".join(body).strip()
                name = line[3:].split(":", 1)[0].strip()
                body = []
            elif name is not None:
                body.append(line)
    if name is not None:
        sections[name] = "".join(body).strip()
    return sections


def main():
    out = ["# Family convergence evidence",
           "",
           "Short real-annotation training runs for the non-flagship model "
           "families, driven end-to-end through `main.py` (same engine, "
           "loader, eval, and scorer as the flagship convergence runs). "
           "Protocol: `tools/run_family_convergence.sh` (mm/raw) and "
           "`tools/run_family_dense.sh` (dense/regular); raw logs "
           "`runs_mm_conv.log` / `runs_raw_conv.log` / "
           "`runs_dense_conv.log` / `runs_regular_conv.log`.",
           ""]
    prior = existing_sections()
    for name, desc in FAMILIES:
        train = read_jsonl(f"runs/{name}/train_log.txt")
        val = read_jsonl(f"runs/{name}/val_log.txt")
        out.append(f"## {name}: {desc}")
        out.append("")
        if not train:
            kept = prior.get(name, "")
            out.append(kept if kept and "_no run data found_" not in kept
                       else "_no run data found_")
            out.append("")
            continue
        first, last = train[0], train[-1]
        keys = [k for k in ("train_loss", "train_loss_caption",
                            "train_loss_bbox", "train_loss_giou")
                if k in first and k in last]
        out.append("| loss | epoch %d | epoch %d | decrease |"
                   % (first.get("epoch", 0), last.get("epoch", 0)))
        out.append("|---|---|---|---|")
        for k in keys:
            a, b = float(first[k]), float(last[k])
            dec = 100.0 * (a - b) / a if a else 0.0
            out.append(f"| {k[6:]} | {a:.4f} | {b:.4f} | {dec:.1f}% |")
        out.append("")
        if val:
            out.append("| epoch | " + " | ".join(SCORE_KEYS) + " |")
            out.append("|---|" + "---|" * len(SCORE_KEYS))
            for row in val:
                cells = [f"{float(row.get('score_' + k, float('nan'))):.3f}"
                         for k in SCORE_KEYS]
                out.append(f"| {row.get('epoch', '?')} | " +
                           " | ".join(cells) + " |")
            out.append("")
    with open("FAMILIES.md", "w") as f:
        f.write("\n".join(out) + "\n")
    print("wrote FAMILIES.md")


if __name__ == "__main__":
    main()
