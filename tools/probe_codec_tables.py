#!/usr/bin/env python3
"""Generate glibc-iconv-vs-Python codec diff tables by probing the
reference binary. Writes html_parser_spark/kernel/_iconv_diffs.py.

For every charset the reference routes through iconv, feed all
structurally-plausible byte sequences (all single bytes + all two-byte
lead/trail combos) through ./parse_html --charset and through Python's
codec; record the sequences whose decodings differ. The result is a
small per-codec dict {bytes: replacement_str} consulted by the kernel's
decode shim.
"""

from __future__ import annotations

import os
import subprocess

REFBUILD = "/tmp/refbuild"
OUT = os.path.join(os.path.dirname(__file__), "..", "html_parser_spark",
                   "kernel", "_iconv_diffs.py")

# charset -> (python codec, lead ranges, trail ranges)
SPECS = {
    "shift_jis": ("shift_jis",
                  list(range(0x81, 0xA0)) + list(range(0xE0, 0xFD)),
                  list(range(0x40, 0x7F)) + list(range(0x80, 0xFD))),
    "big5": ("big5", list(range(0x81, 0xFF)),
             list(range(0x40, 0x7F)) + list(range(0xA1, 0xFF))),
    "gbk": ("gbk", list(range(0x81, 0xFF)),
            list(range(0x40, 0x7F)) + list(range(0x80, 0xFF))),
    "euc-kr": ("euc_kr", list(range(0xA1, 0xFF)), list(range(0xA1, 0xFF))),
    "euc-jp": ("euc_jp", list(range(0xA1, 0xFF)) + [0x8E, 0x8F],
               list(range(0xA1, 0xFF))),
    "windows-1252": ("cp1252", [], []),
    "windows-874": ("cp874", [], []),
    "macintosh": ("mac_roman", [], []),
    "x-mac-cyrillic": ("mac_cyrillic", [], []),
    "ibm866": ("cp866", [], []),
    "koi8-r": ("koi8_r", [], []),
    "koi8-u": ("koi8_u", [], []),
    # NOT "== gbk": ICONV_DIFFS is keyed by PYTHON codec, and glibc's
    # GB18030 maps the 2005 rows (e.g. A6D9 -> U+FE10) where Python's
    # gb18030 keeps the 2000 PUA codepoints (U+E78D...) — probe the
    # full two-byte area under its own codec key
    "gb18030": ("gb18030", list(range(0x81, 0xFF)),
                list(range(0x40, 0x7F)) + list(range(0x80, 0xFF))),
}
for i in list(range(2, 11)) + list(range(13, 17)):
    SPECS[f"iso-8859-{i}"] = (f"iso8859_{i}", [], [])


def ref_decode_batch(charset: str, seqs: list[bytes]) -> list[str] | None:
    """Decode many candidate sequences in one parse: newline-joined
    inside a single text run; read back the TEXT node data."""
    payload = b"<p>" + b"\n".join(seqs) + b"</p>"
    path = "/tmp/probe_batch.html"
    with open(path, "wb") as f:
        f.write(payload)
    p = subprocess.run(
        ["./parse_html", "--charset", charset, path],
        cwd=REFBUILD, capture_output=True, timeout=120,
    )
    if p.returncode != 0:
        return None
    out = p.stdout.decode("utf-8", errors="surrogateescape")
    data = None
    for line in out.split("\n"):
        if "TEXT data=\"" in line:
            data = line.split("data=\"", 1)[1].rsplit("\"", 1)[0]
            break
    if data is None:
        return None
    # dump escapes newline as the two chars \ n
    return data.split("\\n")


def py_decode(pycodec: str, seq: bytes) -> str:
    out = []
    i = 0
    while i < len(seq):
        try:
            out.append(seq[i:].decode(pycodec))
            break
        except UnicodeDecodeError as e:
            good = i + e.start
            if e.start > 0:
                out.append(seq[i:good].decode(pycodec))
            out.append("�")
            i = good + 1
    return "".join(out)


def probe_charset(charset: str, pycodec: str, leads, trails):
    diffs = {}
    # single bytes 0x00-0xFF except controls that break the text run
    singles = [bytes([b]) for b in range(0x20, 0x100)
               if b not in (0x26, 0x3C, 0x0A, 0x0D, 0x00, 0x5D)]
    candidates = singles + [
        bytes([ld, tr]) for ld in leads for tr in trails
        if tr not in (0x0A, 0x0D) and ld not in (0x0A, 0x0D)
    ]
    CHUNK = 4000
    for start in range(0, len(candidates), CHUNK):
        chunk = candidates[start:start + CHUNK]
        ref = ref_decode_batch(charset, chunk)
        if ref is None or len(ref) != len(chunk):
            # fall back to smaller batches on parse interference
            if len(chunk) == 1:
                continue
            for sub in (chunk[: len(chunk) // 2], chunk[len(chunk) // 2:]):
                r = ref_decode_batch(charset, sub)
                if r is not None and len(r) == len(sub):
                    for seq, want in zip(sub, r):
                        got = py_decode(pycodec, seq)
                        if got != want and "\n" not in want:
                            diffs[seq] = want
            continue
        for seq, want in zip(chunk, ref):
            got = py_decode(pycodec, seq)
            if got != want and "\n" not in want:
                diffs[seq] = want
    return diffs


def main():
    all_diffs = {}
    for charset, (pycodec, leads, trails) in sorted(SPECS.items()):
        diffs = probe_charset(charset, pycodec, leads, trails)
        if diffs:
            all_diffs[pycodec] = diffs
        print(f"{charset:16s} ({pycodec}): {len(diffs)} diff sequences")
    with open(OUT, "w", encoding="utf-8") as f:
        f.write('"""AUTO-GENERATED by tools/probe_codec_tables.py.\n\n'
                "Byte sequences whose glibc-iconv decoding (as used by the\n"
                "reference, src/encoding.c:984-1037) differs from Python's\n"
                "codec: {python_codec: {bytes: replacement_str}}.\n"
                '"""\n\n')
        f.write("ICONV_DIFFS = {\n")
        for pycodec, diffs in sorted(all_diffs.items()):
            f.write(f"    {pycodec!r}: {{\n")
            for seq in sorted(diffs):
                f.write(f"        {seq!r}: {diffs[seq]!r},\n")
            f.write("    },\n")
        f.write("}\n")
    total = sum(len(d) for d in all_diffs.values())
    print(f"wrote {OUT} ({total} sequences)")


if __name__ == "__main__":
    main()
