#!/usr/bin/env python3
"""Diff kernel parse-error TEXTS against the golden corpus (the
reference binaries' stderr with HTMLPARSER_PARSE_ERRORS=1).

Usage: python3 tools/diff_error_texts.py [--show N] [case-substr ...]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from html_parser_spark.kernel.api import parse_document, parse_fragment

REFBUILD = "/tmp/refbuild"
GOLDENS = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens",
                       "goldens.json")


def main() -> int:
    show = 3
    args = sys.argv[1:]
    if args and args[0] == "--show":
        show = int(args[1])
        args = args[2:]
    cases = json.load(open(GOLDENS))["cases"]
    nfail = npass = 0
    shown = 0
    for case in cases:
        if args and not any(a in case["case"] for a in args):
            continue
        if case.get("input_b64"):
            import base64

            raw = base64.b64decode(case["input_b64"])
        else:
            with open(os.path.join(REFBUILD, case["file"]), "rb") as f:
                raw = f.read()
        if case["mode"] == "document":
            res = parse_document(raw)
        else:
            res = parse_fragment(raw, case["context"])
        if res.errors == case["errors"]:
            npass += 1
            continue
        nfail += 1
        if shown < show:
            shown += 1
            print(f"== {case['case']} ==")
            want, got = case["errors"], res.errors
            for i in range(max(len(want), len(got))):
                w = want[i] if i < len(want) else "<missing>"
                g = got[i] if i < len(got) else "<missing>"
                mark = " " if w == g else "!"
                if w != g or show > 50:
                    print(f" {mark} ref: {w!r}")
                    print(f" {mark} got: {g!r}")
    print(f"\n{npass} text-equal, {nfail} mismatched")
    return 1 if nfail else 0


if __name__ == "__main__":
    sys.exit(main())
