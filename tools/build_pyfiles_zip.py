#!/usr/bin/env python3
"""Package html_parser_spark for spark-submit --py-files.

Builds dist/html_parser_spark.zip containing the package (kernel data
tables included — mirrors the reference's entities.tsv ship-with-job
caveat, README.md:285: a worker missing the tables would silently
degrade, so they are *generated into* the wheel-free zip)."""

from __future__ import annotations

import os
import zipfile

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
DIST = os.path.join(REPO, "dist")
OUT = os.path.join(DIST, "html_parser_spark.zip")


def main():
    os.makedirs(DIST, exist_ok=True)
    with zipfile.ZipFile(OUT, "w", zipfile.ZIP_DEFLATED) as zf:
        pkg = os.path.join(REPO, "html_parser_spark")
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for fn in files:
                if fn.endswith((".pyc", ".pyo")):
                    continue
                full = os.path.join(root, fn)
                rel = os.path.relpath(full, REPO)
                zf.write(full, rel)
    size = os.path.getsize(OUT)
    print(f"built {OUT} ({size/1024:.0f} KiB)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
