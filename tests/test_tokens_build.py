"""Parity for the pre-tokenized build API (VERDICT r4 item 7).

The reference exposes THREE public build entry points
(include/tree_builder.h:7-14); rounds 1-4 covered from-input document
and fragment builds. This gates the third, build_tree_from_tokens
(src/tree_builder.c:1978-2925), against the repo's
build_document_from_tokens: a purpose-built C harness
(tools/ref_tokens_demo.c, compiled out-of-tree against the
/tmp/refbuild copy) tokenizes each fixture standalone, feeds the
token array to the reference's from-tokens builder, and dumps the
tree; the repo runs the same decode -> replace_nulls ->
tokenize_all -> build_document_from_tokens pipeline and must match
byte-for-byte on all fixtures — including the ones where from-tokens
DIVERGES from the full parser (svg_cdata, the meta-reencode
encodings), because both implementations share the no-feedback
caveat the reference documents for this API.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from ref_harness import build_tokens_harness  # noqa: E402


@pytest.fixture(scope="module")
def harness(refbuild):
    path = build_tokens_harness(refbuild)
    if path is None:
        pytest.skip("harness build failed")
    return path


def _fixture_files(refbuild):
    d = os.path.join(refbuild, "tests")
    return sorted(
        f for f in os.listdir(d) if f.endswith(".html")
    )


def test_from_tokens_matches_reference_on_all_fixtures(refbuild, harness):
    from html_parser_spark.kernel import encoding as enc
    from html_parser_spark.kernel.tokenizer import replace_nulls
    from html_parser_spark.kernel.tree import dump_ascii
    from html_parser_spark.kernel.treebuilder import (
        build_document_from_tokens, tokenize_all,
    )

    files = _fixture_files(refbuild)
    assert len(files) >= 90
    mismatches = []
    for name in files:
        path = os.path.join(refbuild, "tests", name)
        r = subprocess.run([harness, path], capture_output=True)
        # a harness crash must not masquerade as a tree mismatch
        assert r.returncode == 0 and r.stdout, (
            f"harness failed on {name}: rc={r.returncode} "
            f"stderr={r.stderr[:200]!r}")
        # drop the title line; normalize trailing newlines
        want = b"\n".join(r.stdout.split(b"\n")[1:]).rstrip(b"\n")

        with open(path, "rb") as f:
            raw = f.read()
        res = enc.sniff_and_convert(raw, None)
        text = replace_nulls(res.text)
        doc, _errs = build_document_from_tokens(tokenize_all(text))
        got = dump_ascii(doc).rstrip("\n").encode(
            "utf-8", "surrogateescape")
        if got != want:
            mismatches.append(name)
    assert not mismatches, f"from-tokens dump mismatch: {mismatches}"


def test_from_tokens_handmade_token_array():
    """The API's primary use case is a token array NOT produced by a
    tokenizer (the reason the reference exposes it separately): build
    from hand-made tokens, including a text-mode tag whose entry is
    driven by the name-based triggers_text_mode rule, and a missing
    trailing EOF (the feed synthesizes one)."""
    # via the package-level export (html_parser_spark.kernel mirrors
    # the reference's public include/tree_builder.h surface)
    from html_parser_spark.kernel import build_document_from_tokens
    from html_parser_spark.kernel.tokenizer import (
        TOKEN_CHARACTER, TOKEN_END_TAG, TOKEN_START_TAG, Token,
    )
    from html_parser_spark.kernel.tree import dump_ascii

    def tok(ttype, name=None, data=None):
        t = Token()
        t.type = ttype
        t.name = name
        t.data = data
        return t

    tokens = [
        tok(TOKEN_START_TAG, name="div"),
        tok(TOKEN_START_TAG, name="script"),
        # in MODE_TEXT this is plain text under <script>, not markup
        tok(TOKEN_CHARACTER, data="if (a < b) x();"),
        tok(TOKEN_END_TAG, name="script"),
        tok(TOKEN_CHARACTER, data="tail"),
        # no EOF token on purpose
    ]
    doc, errors = build_document_from_tokens(tokens)
    dump = dump_ascii(doc)
    assert 'ELEMENT name="script"' in dump
    assert 'TEXT data="if (a < b) x();"' in dump
    assert 'TEXT data="tail"' in dump
    # implied html/head/body synthesized like the C builder
    assert 'ELEMENT name="html"' in dump
    assert 'ELEMENT name="body"' in dump
    assert isinstance(errors, list)


def test_from_tokens_self_closing_form_in_table():
    """The ONE self_closing divergence between the reference's two
    dispatchers (verified by line-by-line diff): the from-tokens
    builder skips the stack push for a self-closing <form> in a table
    (src/tree_builder.c:2427) where the full parser pushes it
    unconditionally (3305). Found by tokens-mode differential fuzz
    (seed 61006 case 778); pinned here both ways."""
    from html_parser_spark.kernel import build_document_from_tokens
    from html_parser_spark.kernel.tokenizer import (
        TOKEN_START_TAG, Token,
    )
    from html_parser_spark.kernel.tree import dump_ascii
    from html_parser_spark.kernel.treebuilder import build_document

    def tok(name, self_closing=False):
        t = Token()
        t.type = TOKEN_START_TAG
        t.name = name
        t.self_closing = self_closing
        return t

    tokens = [tok("table"), tok("form", self_closing=True), tok("li")]
    doc, _ = build_document_from_tokens(tokens)
    dump = dump_ascii(doc)
    # form popped (never pushed): li fosters as form's SIBLING
    assert '|-- ELEMENT name="form"\n        |-- ELEMENT name="li"' \
        in dump

    # the full parser keeps form open: li nests INSIDE it
    doc2, _, _ = build_document("<table><form/><li>")
    dump2 = dump_ascii(doc2)
    assert ('ELEMENT name="form"\n        |   '
            '\\-- ELEMENT name="li"') in dump2


def test_from_tokens_diverges_only_on_feedback_fixtures(refbuild, harness):
    """Pin the documented caveat itself: the fixtures where the
    from-tokens build differs from the FULL parser are exactly the
    tokenizer<->builder feedback cases (foreign CDATA gating, meta
    re-encode), nothing else."""
    from html_parser_spark.kernel.api import parse_document
    from html_parser_spark.kernel import encoding as enc
    from html_parser_spark.kernel.tokenizer import replace_nulls
    from html_parser_spark.kernel.tree import dump_ascii
    from html_parser_spark.kernel.treebuilder import (
        build_document_from_tokens, tokenize_all,
    )

    diverging = set()
    for name in _fixture_files(refbuild):
        path = os.path.join(refbuild, "tests", name)
        with open(path, "rb") as f:
            raw = f.read()
        res = enc.sniff_and_convert(raw, None)
        text = replace_nulls(res.text)
        doc, _ = build_document_from_tokens(tokenize_all(text))
        full = parse_document(raw)
        full_doc = full.doc
        # from-tokens never stamps an encoding; compare shape only
        full_doc.encoding = None
        if dump_ascii(doc) != dump_ascii(full_doc):
            diverging.add(name)
    # two known fixtures exercise feedback the token array cannot
    # carry: encoding_reenc_meta (the §13.2.3.5 re-encode handshake —
    # its meta sits past what the 1,024-byte prescan resolves, so only
    # the in-parse handshake can re-decode) and svg_cdata (the
    # builder-driven allow_cdata gate — standalone tokenization turns
    # foreign CDATA into a bogus comment). The same two diverge
    # between the C build_tree_from_tokens and build_tree_from_input,
    # measured with the Makefile-flag harness build.
    #
    # Assert BOTH directions without over-pinning the fixture list: the
    # two known feedback fixtures must diverge, and anything else that
    # diverges must itself be a feedback case (CDATA or late meta) —
    # a NEW reference fixture exercising feedback extends the allowed
    # set below instead of breaking parity-correct behavior.
    known_feedback = {"encoding_reenc_meta.html", "svg_cdata.html"}
    assert known_feedback <= diverging, diverging
    assert diverging <= known_feedback, (
        f"unexpected from-tokens divergence outside the known "
        f"feedback fixtures: {sorted(diverging - known_feedback)} — "
        f"if these exercise tokenizer<->builder feedback (CDATA "
        f"gating / in-parse re-encode), add them to known_feedback; "
        f"otherwise this is a real parity bug")
