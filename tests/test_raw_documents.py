"""Encoding-path pipeline: the 11 reference encoding fixtures as binary
rows through the Spark kernel; sniffed encodings + extracted text must
match the reference parse (incl. the §13.2.3.5 re-encode case)."""

import glob
import os

import pytest

pytestmark = pytest.mark.spark


def test_raw_documents_encoding_fixtures(spark, refbuild):
    from html_parser_spark.kernel.api import parse_document
    from html_parser_spark.spark.raw_documents import extract_raw_documents

    files = sorted(glob.glob(os.path.join(refbuild, "tests",
                                          "encoding_*.html")))
    assert len(files) >= 11
    rows = []
    expected = {}
    for fn in files:
        doc_id = os.path.basename(fn)[:-5]
        raw = open(fn, "rb").read()
        rows.append((doc_id, bytearray(raw), None))
        res = parse_document(raw)
        expected[doc_id] = (res.extract_text()[0], res.encoding,
                            res.error_count)

    df = spark.createDataFrame(
        rows, "doc_id string, content binary, charset_hint string"
    ).repartition(3)
    got = {
        r.doc_id: (r.extracted_text, r.doc_encoding, r.parse_errors)
        for r in extract_raw_documents(df).collect()
    }
    assert got == expected
    encodings = {enc for _, enc, _ in got.values()}
    # the fixture set covers at least these sniff outcomes
    assert {"UTF-8", "windows-1252", "Shift_JIS", "GBK",
            "ISO-2022-JP"} <= encodings


def test_raw_documents_charset_hint(spark):
    from html_parser_spark.spark.raw_documents import extract_raw_documents

    rows = [
        ("w1252", bytearray(b"<p>quote \x93x\x94</p>"), "windows-1252"),
        ("sjis", bytearray("<p>こんにちは</p>".encode("shift_jis")),
         "shift_jis"),
        ("none", bytearray(b"<p>plain</p>"), None),
    ]
    df = spark.createDataFrame(
        rows, "doc_id string, content binary, charset_hint string")
    got = {r.doc_id: (r.extracted_text, r.doc_encoding)
           for r in extract_raw_documents(df).collect()}
    assert got["w1252"] == ("quote “x”", "windows-1252")
    assert got["sjis"] == ("こんにちは", "Shift_JIS")
    assert got["none"] == ("plain", "UTF-8")


def test_synth_raw_corpus_matches_reference(spark, refbuild):
    """The registered raw_encoding corpus must be byte-equal to the
    reference binaries (dump + error TEXTS + encoding), --charset hint
    included — so its snapshot oracle is golden-gated, not self-pinned."""
    import subprocess

    from html_parser_spark.kernel.api import parse_document
    from html_parser_spark.spark.raw_documents import synth_raw_documents_df

    pre = "[parse error] "
    rows = synth_raw_documents_df(spark).collect()
    assert len(rows) >= 13
    bad = []
    for r in rows:
        raw = bytes(r.content)
        with open("/tmp/raw_corpus_case.html", "wb") as f:
            f.write(raw)
        cmd = ["./parse_html"]
        if r.charset_hint:
            cmd += ["--charset", r.charset_hint]
        cmd.append("/tmp/raw_corpus_case.html")
        p = subprocess.run(
            cmd, cwd=refbuild, capture_output=True,
            env={"HTMLPARSER_PARSE_ERRORS": "1", "PATH": "/usr/bin:/bin"},
        )
        out = p.stdout.decode("utf-8", "surrogateescape")
        dump = "\n".join(out.split("\n")[1:])
        if dump.endswith("\n"):
            dump = dump[:-1]
        errs = [
            ln[len(pre):]
            for ln in p.stderr.decode("utf-8", "surrogateescape").splitlines()
            if ln.startswith(pre)
        ]
        res = parse_document(raw, r.charset_hint)
        if res.dump() != dump or res.errors != errs:
            bad.append(r.doc_id)
    assert not bad, f"raw-corpus reference mismatches: {bad}"
