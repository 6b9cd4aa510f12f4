#!/usr/bin/env python3
"""Differential fuzzing of the ENCODING path: random byte documents
(BOMs, meta charsets, multi-byte sequences, invalid bytes) through
./parse_html vs kernel.parse_document. Compares full ASCII dumps.

Usage: python3 tools/fuzz_encoding.py [N] [--seed S]
"""

from __future__ import annotations

import os
import random
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from html_parser_spark.kernel.api import parse_document  # noqa: E402

REFBUILD = "/tmp/refbuild"

LABELS = ["utf-8", "windows-1252", "shift_jis", "gbk", "euc-kr", "big5",
          "iso-2022-jp", "koi8-r", "iso-8859-7", "utf-16", "x-user-defined",
          "latin1", "unknown-junk", "UTF-8", " Shift_JIS ", "ms932",
          "iso-8859-8-i", "tis-620", "gb18030", "ibm866", "macintosh"]

BOMS = [b"", b"", b"", b"\xef\xbb\xbf", b"\xff\xfe", b"\xfe\xff"]

MULTIBYTE_SAMPLES = [
    "こんにちは".encode("shift_jis"),
    "中文测试".encode("gbk"),
    "한국어".encode("euc-kr"),
    "Ωμέγα".encode("iso-8859-7"),
    "déjà vu".encode("cp1252"),
    "русский".encode("koi8-r"),
    b"\x1b$B$3$s$K$A$O\x1b(B",
    "漢字".encode("euc_jp"),
    "繁體".encode("big5"),
]

RAW_JUNK = [bytes([b]) for b in (0x80, 0x93, 0xA0, 0xC3, 0xE3, 0xFF, 0x00,
                                 0x1B, 0x8E)]


def gen(rng: random.Random) -> bytes:
    parts = [rng.choice(BOMS)]
    if rng.random() < 0.7:
        label = rng.choice(LABELS)
        style = rng.random()
        if style < 0.5:
            parts.append(f"<meta charset={label}>".encode("ascii"))
        elif style < 0.8:
            parts.append(
                f"<meta http-equiv=Content-Type content=\"text/html; "
                f"charset={label}\">".encode("ascii"))
        else:
            parts.append(
                f"<meta content='charset={label}' "
                f"http-equiv='content-type'>".encode("ascii"))
    if rng.random() < 0.2:
        parts.append(b"<!-- " + b"x" * rng.randint(0, 1200) + b" -->")
    for _ in range(rng.randint(1, 10)):
        r = rng.random()
        if r < 0.4:
            parts.append(rng.choice(MULTIBYTE_SAMPLES))
        elif r < 0.6:
            parts.append(b"<p>plain " + bytes(
                rng.choice(b"abcdefgh <>&;") for _ in range(rng.randint(0, 20))
            ) + b"</p>")
        elif r < 0.8:
            parts.append(rng.choice(RAW_JUNK) * rng.randint(1, 4))
        else:
            parts.append(bytes(rng.randrange(256)
                               for _ in range(rng.randint(1, 24))))
    return b"".join(parts)


def ref_dump(data: bytes, hint=None):
    path = "/tmp/fuzz_enc_case.html"
    with open(path, "wb") as f:
        f.write(data)
    cmd = ["./parse_html"]
    if hint:
        cmd += ["--charset", hint]
    cmd.append(path)
    p = subprocess.run(cmd, cwd=REFBUILD, capture_output=True, timeout=30)
    out = p.stdout.decode("utf-8", errors="surrogateescape")
    lines = out.split("\n")
    dump = "\n".join(lines[1:])
    if dump.endswith("\n"):
        dump = dump[:-1]
    return p.returncode, dump


def main():
    n = 1000
    seed = 1
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if args:
        n = int(args[0])
    if "--seed" in sys.argv:
        seed = int(sys.argv[sys.argv.index("--seed") + 1])
    rng = random.Random(seed)
    fails = 0
    for i in range(n):
        data = gen(rng)
        hint = rng.choice([None, None, None] + LABELS[:8])
        rc, want = ref_dump(data, hint)
        if rc != 0:
            continue
        try:
            mine = parse_document(data, hint).dump()
        except Exception as e:  # noqa: BLE001
            mine = f"<exception: {e!r}>"
        if mine != want:
            fails += 1
            fn = f"/tmp/fuzz_enc_fail_{seed}_{i}.html"
            with open(fn, "wb") as f:
                f.write(data)
            print(f"MISMATCH case {i} hint={hint} -> {fn}")
            wl, ml = want.split("\n"), mine.split("\n")
            for j in range(max(len(wl), len(ml))):
                a = wl[j] if j < len(wl) else "<missing>"
                b = ml[j] if j < len(ml) else "<missing>"
                if a != b:
                    print(f"  line {j+1}:\n    ref: {a!r}\n    py : {b!r}")
                    break
            if fails >= 8:
                break
    print(f"{n} cases, {fails} mismatches (seed={seed})")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
