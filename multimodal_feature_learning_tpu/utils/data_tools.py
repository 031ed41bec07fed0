"""Standalone data tooling.

Behavioral spec: reference ``utils/make_h5.py`` (synthetic feature h5
fixture), ``utils/check_timestamps.py`` (find GT with start >= end),
``utils/get_invalid_ids.py`` (missing/corrupt source videos -> invalid_ids
json).  Exposed both as functions and a CLI (`python -m
multimodal_feature_learning_tpu.utils.data_tools <cmd>`).
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Dict, List


def make_h5(annotation_file: str, out_path: str, num_tokens: int = 64,
            feature_dim: int = 512, seed: int = 0):
    """Synthetic feature file keyed by video id (reference make_h5.py:1-21)."""
    import h5py
    import numpy as np

    with open(annotation_file) as f:
        ann = json.load(f)
    rng = np.random.default_rng(seed)
    with h5py.File(out_path, "w") as h5:
        for key in ann:
            h5.create_dataset(
                key, data=rng.random((num_tokens, feature_dim), dtype=np.float32)
            )
    return out_path


def check_timestamps(annotation_files: List[str]) -> Dict[str, List]:
    """Video ids whose GT has start >= end (reference check_timestamps.py)."""
    bad: Dict[str, List] = {}
    for path in annotation_files:
        with open(path) as f:
            ann = json.load(f)
        for vid, entry in ann.items():
            for ts in entry["timestamps"]:
                if ts[0] >= ts[1]:
                    bad.setdefault(vid, []).append(ts)
    return bad


def get_invalid_ids(annotation_files: List[str], video_folder: str,
                    out_json: str = "", extension: str = ".mp4") -> List[str]:
    """Ids with no source video on disk (reference get_invalid_ids.py)."""
    present = set()
    if os.path.isdir(video_folder):
        present = {os.path.splitext(f)[0] for f in os.listdir(video_folder)}
    invalid = []
    for path in annotation_files:
        with open(path) as f:
            ann = json.load(f)
        for vid in ann:
            if vid not in present and f"v_{vid}" not in present:
                invalid.append(vid)
    if out_json:
        with open(out_json, "w") as f:
            json.dump(invalid, f)
    return invalid


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    mh = sub.add_parser("make-h5")
    mh.add_argument("annotation_file")
    mh.add_argument("out_path")
    mh.add_argument("--num-tokens", type=int, default=64)
    mh.add_argument("--feature-dim", type=int, default=512)
    ct = sub.add_parser("check-timestamps")
    ct.add_argument("annotation_files", nargs="+")
    gi = sub.add_parser("get-invalid-ids")
    gi.add_argument("annotation_files", nargs="+")
    gi.add_argument("--video-folder", required=True)
    gi.add_argument("--out-json", default="invalid_ids.json")
    args = p.parse_args()

    if args.cmd == "make-h5":
        print(make_h5(args.annotation_file, args.out_path, args.num_tokens, args.feature_dim))
    elif args.cmd == "check-timestamps":
        print(json.dumps(check_timestamps(args.annotation_files), indent=2))
    elif args.cmd == "get-invalid-ids":
        ids = get_invalid_ids(args.annotation_files, args.video_folder, args.out_json)
        print(f"{len(ids)} invalid ids -> {args.out_json}")


if __name__ == "__main__":
    main()
