"""Average benchmark stats across scenes into one summary JSON.

TPU analog of the reference's
examples/benchmarks/compression/summarize_stats.py (tyro CLI, zips the
compression artifacts and averages stats/<stage>_step*.json). This repo's
trainer writes val_step<N>.json at the scene root and
compression_<N>/report.json, and argparse replaces tyro (not in the image).

Usage:
    python summarize_stats.py --results-dir /tmp/bench_results/basic \
        --scenes garden bicycle --stage val
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import zipfile
from collections import defaultdict

import numpy as np


def _latest(pattern: str) -> str | None:
    paths = glob.glob(pattern)
    if not paths:
        return None

    def step_of(p: str) -> int:
        digits = "".join(c for c in os.path.basename(p) if c.isdigit())
        return int(digits) if digits else -1

    return max(paths, key=step_of)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--results-dir", required=True)
    ap.add_argument("--scenes", nargs="+", required=True)
    ap.add_argument("--stage", default="compress", choices=["compress", "val"])
    args = ap.parse_args()

    summary: dict[str, list] = defaultdict(list)
    for scene in args.scenes:
        scene_dir = os.path.join(args.results_dir, scene)

        if args.stage == "compress":
            cdir = _latest(os.path.join(scene_dir, "compression_*"))
            if cdir is None:
                print(f"skip {scene}: no compression_* dir")
                continue
            # reference zips the artifact dir and records the zip size
            zip_path = os.path.join(scene_dir, "compression.zip")
            with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_STORED) as zf:
                for f in sorted(os.listdir(cdir)):
                    if f != "report.json":
                        zf.write(os.path.join(cdir, f), f)
            summary["size"].append(os.path.getsize(zip_path))
            stats_path = os.path.join(cdir, "report.json")
        else:
            stats_path = _latest(os.path.join(scene_dir, "val_step*.json"))
            if stats_path is None:
                print(f"skip {scene}: no val_step*.json")
                continue

        with open(stats_path) as f:
            for k, v in json.load(f).items():
                if isinstance(v, (int, float)):
                    summary[k].append(v)

    out = {k: float(np.mean(v)) for k, v in summary.items()}
    out["scenes"] = args.scenes
    out_path = os.path.join(args.results_dir, f"{args.stage}_summary.json")
    with open(out_path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
