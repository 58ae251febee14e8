#!/usr/bin/env python
"""Build the spark-submit --py-files artifact (engine.zip).

The north rule packages the engine for `spark-submit --py-files` on
multi-executor clusters: every executor python worker imports
data_validator_spark from the shipped zip, so the zip must contain
the package tree exactly as importable (no setup.py needed — zip
roots are appended to sys.path by Spark).

Usage: python tools/make_pyfiles.py [out.zip]   (default engine.zip)
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str) -> str:
    pkg = os.path.join(REPO, "data_validator_spark")
    # deterministic member order + no timestamps drift: sorted walk
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, dirs, files in sorted(os.walk(pkg)):
            dirs.sort()
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for fn in sorted(files):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(root, fn)
                rel = os.path.relpath(full, REPO)
                zf.write(full, rel)
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "engine.zip")
    print(build(out))
