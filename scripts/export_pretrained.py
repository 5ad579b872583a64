"""Snapshot a trained run into the tracked pretrained_models/ bundle.

The reference ships pretrained weights via start.sh's wget of a tarball
(/root/reference/start.sh:15-22); this framework ships them in-repo under
pretrained_models/ (git-tracked — see .gitignore's re-allow block), so
--evaluate / --student / bench.py work out of a fresh checkout without
retraining.  runs/ itself stays untracked scratch space.

Copies the 5-component checkpoint (model-*.npz), any fidelity.json /
higgins.log / evaluation_metrics_*.txt / mse_*.json records, and writes a
MANIFEST.json with provenance (source run, train command from train.log if
present, file sizes).

Usage:
  python scripts/export_pretrained.py runs/minipacman_cf \
      [--name minipacman_cf] [--max-mb 64]
"""

import argparse
import glob
import hashlib
import json
import os
import shutil
import sys
import time

KEEP_PATTERNS = (
    "model-*.npz",            # 5-component checkpoint (+ student transition)
    "fidelity.json",          # distillation gate record (bench.py reads it)
    "higgins.log",
    "evaluation_metrics_*.txt",
    "mse_*.json",
    "config.json",
)


def export(src: str, name: str | None = None, max_mb: float = 64.0,
           root: str = "pretrained_models") -> str:
    if not os.path.isdir(src):
        raise SystemExit(f"not a directory: {src}")
    name = name or os.path.basename(os.path.normpath(src))
    dst = os.path.join(root, name)
    os.makedirs(dst, exist_ok=True)

    files = []
    for pat in KEEP_PATTERNS:
        files.extend(sorted(glob.glob(os.path.join(src, pat))))
    if not files:
        raise SystemExit(f"nothing to export from {src}")

    total = sum(os.path.getsize(f) for f in files)
    if total > max_mb * 1e6:
        raise SystemExit(
            f"bundle would be {total / 1e6:.1f} MB > --max-mb {max_mb}")

    manifest = {
        "source": src,
        "exported_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "files": {},
    }
    for f in files:
        base = os.path.basename(f)
        shutil.copy2(f, os.path.join(dst, base))
        with open(f, "rb") as fh:
            digest = hashlib.sha256(fh.read()).hexdigest()[:16]
        manifest["files"][base] = {
            "bytes": os.path.getsize(f), "sha256_16": digest}

    log = os.path.join(src, "train.log")
    if os.path.exists(log):
        with open(log, errors="replace") as fh:
            first = fh.readline().strip()
        manifest["train_log_head"] = first[:500]

    with open(os.path.join(dst, "MANIFEST.json"), "w") as fh:
        json.dump(manifest, fh, indent=2)
    print(f"exported {len(files)} files ({total / 1e6:.2f} MB) -> {dst}")
    return dst


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("src")
    p.add_argument("--name", default=None)
    p.add_argument("--max-mb", type=float, default=64.0)
    p.add_argument("--root", default="pretrained_models")
    a = p.parse_args(argv)
    export(a.src, a.name, a.max_mb, a.root)


if __name__ == "__main__":
    sys.exit(main())
