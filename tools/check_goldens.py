#!/usr/bin/env python3
"""Compare the Python kernel against the minted reference goldens.

Usage: python3 tools/check_goldens.py [--verbose] [case-substring ...]
Exit 0 iff all checks pass.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from html_parser_spark.kernel import encoding as enc  # noqa: E402
from html_parser_spark.kernel.api import parse_document, parse_fragment  # noqa: E402
from html_parser_spark.kernel.tokenizer import replace_nulls  # noqa: E402
from html_parser_spark.kernel.treebuilder import build_document  # noqa: E402
from html_parser_spark.kernel.tree import serialize_html  # noqa: E402

GOLDENS = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens",
                       "goldens.json")
REFBUILD = "/tmp/refbuild"


def first_diff(a: str, b: str):
    al, bl = a.split("\n"), b.split("\n")
    for i in range(max(len(al), len(bl))):
        x = al[i] if i < len(al) else "<missing>"
        y = bl[i] if i < len(bl) else "<missing>"
        if x != y:
            return i + 1, x, y
    return None


def main():
    verbose = "--verbose" in sys.argv
    filters = [a for a in sys.argv[1:] if not a.startswith("--")]
    with open(GOLDENS, encoding="utf-8") as f:
        cases = json.load(f)["cases"]
    npass = nfail = 0
    fail_names = []
    for case in cases:
        name = case["case"]
        if filters and not any(f in name for f in filters):
            continue
        if case.get("input_b64"):
            import base64

            raw = base64.b64decode(case["input_b64"])
        else:
            raw = open(os.path.join(REFBUILD, case["file"]), "rb").read()
        try:
            if case["mode"] == "document":
                res = parse_document(raw)
                mine_dump = res.dump()
                ok = True
                msgs = []
                want = case["dump"]
                if mine_dump != want:
                    ok = False
                    msgs.append(("dump", first_diff(want, mine_dump)))
                if case["serialized"] is not None:
                    # serialize_demo path: IRRELEVANT confidence, no encoding
                    sr = enc.sniff_and_convert(raw, None)
                    text = replace_nulls(sr.text)
                    doc, _, _ = build_document(text, None, enc.CONF_IRRELEVANT)
                    mine_ser = serialize_html(doc)
                    if mine_ser != case["serialized"]:
                        ok = False
                        msgs.append(("serialize",
                                     first_diff(case["serialized"], mine_ser)))
                if res.errors != case.get("errors", res.errors) \
                        or res.error_count != case["error_count"]:
                    ok = False
                    msgs.append(("errors",
                                 f"want {case['error_count']} got {res.error_count}"))
            else:
                res = parse_fragment(raw, case["context"])
                mine_dump = res.dump()
                want = case["dump"]
                ok = True
                msgs = []
                if mine_dump != want:
                    ok = False
                    msgs.append(("dump", first_diff(want, mine_dump)))
                if res.errors != case.get("errors", res.errors) \
                        or res.error_count != case["error_count"]:
                    ok = False
                    msgs.append(("errors",
                                 f"want {case['error_count']} got {res.error_count}"))
        except Exception as e:  # noqa: BLE001
            ok = False
            import traceback
            msgs = [("exception", traceback.format_exc() if verbose else repr(e))]
        if ok:
            npass += 1
        else:
            nfail += 1
            fail_names.append(name)
            print(f"FAIL {name}")
            for kind, info in msgs:
                print(f"   {kind}: {info}")
    print(f"\n{npass} pass, {nfail} fail")
    if nfail:
        print("failing:", " ".join(fail_names[:40]))
    return 1 if nfail else 0


if __name__ == "__main__":
    sys.exit(main())
