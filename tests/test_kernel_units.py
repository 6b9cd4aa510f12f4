"""Unit tests for kernel components (tokenizer, charrefs, encoding,
extraction, fast path). Complements the golden byte-equality suite."""

import pytest

from html_parser_spark.kernel import encoding as enc
from html_parser_spark.kernel.api import parse_document, parse_fragment
from html_parser_spark.kernel.charref import decode_character_references
from html_parser_spark.kernel.tokenizer import (
    TOKEN_CHARACTER, TOKEN_END_TAG, TOKEN_EOF, TOKEN_START_TAG, Tokenizer,
    replace_nulls,
)
from html_parser_spark.spark.udfs import fast_extract, parse_turn


def _tokens(text, context=None):
    tz = Tokenizer(text, context)
    out = []
    while True:
        t = tz.next()
        out.append(t)
        if t.type == TOKEN_EOF:
            return out, tz


class TestPreprocess:
    def test_crlf_and_nul(self):
        assert replace_nulls("a\r\nb\rc\x00d") == "a\nb\nc�d"

    def test_lone_cr_fast_path_kept(self):
        # reference fast path: no CRLF, no NUL -> unchanged (bug-compat)
        assert replace_nulls("a\rb") == "a\rb"

    def test_empty(self):
        assert replace_nulls("") == ""


class TestCharrefs:
    def test_named_longest_match(self):
        assert decode_character_references("&notin;", False, []) == "∉"

    def test_legacy_no_semicolon(self):
        assert decode_character_references("&amp x", False, []) == "& x"

    def test_legacy_blocked_by_alnum(self):
        assert decode_character_references("&ampx", False, []) == "&ampx"

    def test_attr_equals_blocks(self):
        assert decode_character_references("&amp=", True, []) == "&amp="
        assert decode_character_references("&amp=", False, []) == "&="

    def test_numeric_corrections(self):
        errs = []
        assert decode_character_references("&#0;", False, errs) == "�"
        assert decode_character_references("&#xD800;", False, errs) == "�"
        assert decode_character_references("&#x80;", False, errs) == "€"
        assert decode_character_references("&#xFDD0;", False, errs) == "﷐"

    def test_numeric_no_semicolon(self):
        assert decode_character_references("&#65 x", False, []) == "A x"

    def test_bare_hash(self):
        assert decode_character_references("&#x;", False, []) == "&#x;"

    def test_newline_entity_excluded(self):
        # the reference's TSV loader drops the NewLine entity
        assert decode_character_references("&NewLine;", False, []) == "&NewLine;"


class TestTokenizer:
    def test_coalesced_text_run(self):
        toks, _ = _tokens("hello world")
        assert toks[0].type == TOKEN_CHARACTER and toks[0].data == "hello world"

    def test_end_tag_nonalpha_literal_lt(self):
        toks, tz = _tokens("</ x>")
        assert toks[0].type == TOKEN_CHARACTER and toks[0].data == "<"
        assert tz.errors  # invalid end tag

    def test_duplicate_attr_dropped(self):
        toks, _ = _tokens("<a x=1 x=2>")
        assert toks[0].attrs == [("x", "1")]

    def test_attr_name_buffer_quirk(self):
        # AFTER_ATTR_NAME does not reset the name buffer (C quirk)
        toks, _ = _tokens("<a face class=1>")
        assert toks[0].attrs == [("face", ""), ("faceclass", "1")]

    def test_script_double_escape(self):
        text = "<script><!--<script>a</script>b--></script>"
        toks, _ = _tokens(text)
        assert toks[0].type == TOKEN_START_TAG
        assert toks[1].type == TOKEN_CHARACTER
        assert toks[1].data == "<!--<script>a</script>b-->"
        assert toks[2].type == TOKEN_END_TAG

    def test_comment_edges(self):
        for text, want in [
            ("<!-->", ""),
            ("<!--->", ""),
            ("<!-- a --!>", " a "),
            ("<!-- -- -->", " -- "),
        ]:
            toks, _ = _tokens(text)
            assert toks[0].data == want, text

    def test_plaintext_never_exits(self):
        toks, _ = _tokens("<plaintext>a</plaintext>b")
        assert toks[1].data == "a</plaintext>b"

    def test_rcdata_decodes_refs(self):
        toks, _ = _tokens("<title>a &amp; b</title>")
        assert toks[1].data == "a & b"

    def test_rawtext_keeps_refs(self):
        toks, _ = _tokens("<style>a &amp; b</style>")
        assert toks[1].data == "a &amp; b"


class TestEncoding:
    def test_bom_precedence(self):
        r = enc.sniff_and_convert("﻿hi".encode("utf-8"))
        assert r.encoding == "UTF-8" and r.confidence == enc.CONF_CERTAIN
        assert r.text == "hi"

    def test_utf16le(self):
        r = enc.sniff_and_convert(b"\xff\xfeh\x00i\x00")
        assert r.encoding == "UTF-16LE" and r.text == "hi"

    def test_utf16_odd_trailing_byte(self):
        r = enc.sniff_and_convert(b"\xff\xfeh\x00i")
        assert r.text == "h�"

    def test_meta_prescan(self):
        raw = b"<html><meta charset='windows-1252'>\x93"
        r = enc.sniff_and_convert(raw)
        assert r.encoding == "windows-1252"
        assert r.text.endswith("“")

    def test_meta_prescan_limit_1024(self):
        raw = b" " * 1024 + b"<meta charset='windows-1252'>"
        r = enc.sniff_and_convert(raw)
        assert r.encoding == "UTF-8"

    def test_label_resolution(self):
        assert enc.resolve_label(" LATIN1 ") == "windows-1252"
        assert enc.resolve_label("unknown-enc") is None

    def test_reencode_on_late_meta(self):
        # meta past the prescan window triggers §13.2.3.5 re-parse
        raw = b"<html>" + b"<!-- " + b"x" * 1100 + b" -->" + \
            b"<head><meta charset=windows-1252></head>\x93"
        res = parse_document(raw)
        assert res.encoding == "windows-1252"
        text, _ = res.extract_text()
        assert "“" in text

    def test_x_user_defined(self):
        r = enc.sniff_and_convert(b"a\xff", "x-user-defined")
        assert r.text == "a"

    def test_iso2022jp(self):
        # the reference's output-flag security rule emits U+FFFD on the
        # escape-back-to-ASCII transition after emitted kanji — verified
        # against the C binary on these exact bytes
        raw = b"\x1b$B$3$s$K$A$O\x1b(B"
        r = enc.sniff_and_convert(raw, "iso-2022-jp")
        assert r.text == "こんにちは�"


class TestExtraction:
    def test_spans_offsets(self):
        res = parse_fragment("<p>ab</p><p>cd</p>", "div")
        text, spans = res.extract_text()
        assert text == "abcd"
        assert [(s["start"], s["end"], s["path"]) for s in spans] == [
            (0, 2, "p"), (2, 4, "p"),
        ]

    def test_whitespace_only_dropped(self):
        res = parse_fragment("<p>  </p>", "div")
        text, spans = res.extract_text()
        assert text == "" and spans == []

    def test_document_paths(self):
        res = parse_document("<!DOCTYPE html><p>hi</p>")
        text, spans = res.extract_text()
        assert text == "hi"
        assert spans[0]["path"] == "html/body/p"


@pytest.mark.parametrize("mode,context", [
    ("fragment", "div"), ("fragment", "td"), ("fragment", "select"),
    ("fragment", "template"), ("fragment", "title"), ("document", "div"),
])
def test_fast_path_equivalence(mode, context):
    samples = ["", " ", "  \n\t ", "hello", "hi &amp; x", "&#32;", "&#9;",
               "a\x00b", "\r\nx", "x\r", "&bogus; &not x", "&#xD800;done",
               "word " * 30]
    for s in samples:
        fast = fast_extract(s, mode, context)
        full = parse_document(s) if mode == "document" else \
            parse_fragment(s, context)
        ext, spans = full.extract_text()
        want = (ext, spans, full.error_count, full.node_count,
                full.encoding or "UTF-8", full.errors)
        assert fast == want, (mode, context, s)


def test_parse_turn_raw_context_uses_full_parser():
    # script context: charrefs must NOT decode
    ext, spans, errs, nodes, _, _ = parse_turn(
        "a &amp; b", "fragment", "script")
    assert ext == "a &amp; b"


class TestDeepNesting:
    """Stack-cap (256) silent-drop and dump prefix-truncation parity,
    compared live against the reference binary."""

    CASES = [
        "<div>" * 300 + "deep" + "</div>" * 300,
        "<b>" * 500 + "x",
        "<span>" * 260 + "y" + "</span>" * 10,
        "<table>" * 100 + "<td>z",
        "<svg>" * 300 + "w",
    ]

    def test_deep_nesting_matches_reference(self, refbuild):
        import subprocess

        for text in self.CASES:
            path = "/tmp/_deep_case.html"
            with open(path, "w") as f:
                f.write(text)
            p = subprocess.run(["./parse_html", path], cwd=refbuild,
                               capture_output=True, timeout=60)
            out = p.stdout.decode("utf-8", errors="surrogateescape")
            want = "\n".join(out.split("\n")[1:])
            if want.endswith("\n"):
                want = want[:-1]
            assert parse_document(text).dump() == want


class TestTemplateAutocloseInterplay:
    """Regression for the round-3 in-body fast path: in_template must
    be read BEFORE _body_autoclose (which can pop the template content
    wrapper). Found by differential fuzz (seed 10026); the reference
    inserts the section tag at DOCUMENT level here."""

    CASES = [
        "<tbody><template ><thead",
        "<tbody><template><thead></thead>",
        "<template><tbody><thead>x",
        "<tbody><template ><tfoot",
        "<table><template><colgroup>",
    ]

    def test_template_autoclose_matches_reference(self, refbuild,
                                                   tmp_path):
        import subprocess

        for i, text in enumerate(self.CASES):
            path = str(tmp_path / f"tmpl_case_{i}.html")
            with open(path, "w") as f:
                f.write(text)
            p = subprocess.run(["./parse_html", path], cwd=refbuild,
                               capture_output=True, timeout=60)
            out = p.stdout.decode("utf-8", errors="surrogateescape")
            want = "\n".join(out.split("\n")[1:])
            if want.endswith("\n"):
                want = want[:-1]
            assert parse_document(text).dump() == want, text
