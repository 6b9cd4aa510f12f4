"""Property-based tests (hypothesis) for kernel invariants.

These complement the golden/differential suites with generated inputs:
the kernel must never raise, spans must exactly reconstruct the
extracted text, preprocessing must be idempotent, and the '<'-free
fast path must equal the full parse on arbitrary text.
"""

from hypothesis import given, settings, strategies as st

from html_parser_spark.kernel.api import parse_document, parse_fragment
from html_parser_spark.kernel.tokenizer import replace_nulls
from html_parser_spark.spark.udfs import fast_extract

# text including markup-ish characters, entities, controls, unicode
_html_text = st.text(
    alphabet=st.one_of(
        st.characters(min_codepoint=0x20, max_codepoint=0x7E),
        st.sampled_from("<>&;#/!-=\"'\n\r\t\x00"),
        st.characters(min_codepoint=0xA0, max_codepoint=0x2FFF),
    ),
    max_size=300,
)

_plain_text = st.text(
    alphabet=st.one_of(
        st.characters(min_codepoint=0x20, max_codepoint=0x3B),  # no '<'
        st.sampled_from("&;# \n\r\t\x00é漢"),
    ),
    max_size=200,
)

_contexts = st.sampled_from(["div", "td", "table", "select", "template",
                             "title", "p"])


@settings(max_examples=300, deadline=None)
@given(_html_text, _contexts)
def test_fragment_parse_total(text, context):
    res = parse_fragment(text, context)
    extracted, spans = res.extract_text()
    # spans partition the extracted text exactly, in order
    pos = 0
    for s in spans:
        assert s["start"] == pos
        assert s["end"] >= s["start"]
        pos = s["end"]
    assert pos == len(extracted)
    # dump and serialize never raise and are strings
    assert isinstance(res.dump(), str)
    assert isinstance(res.serialize(), str)


@settings(max_examples=200, deadline=None)
@given(_html_text)
def test_document_parse_total(text):
    res = parse_document(text)
    extracted, spans = res.extract_text()
    assert res.doc is not None
    assert all(s["end"] <= len(extracted) for s in spans)


@settings(max_examples=300, deadline=None)
@given(_html_text)
def test_replace_nulls_idempotent(text):
    once = replace_nulls(text)
    assert replace_nulls(once) == once
    assert "\x00" not in once
    assert "\r\n" not in once


@settings(max_examples=300, deadline=None)
@given(_plain_text, st.sampled_from(["div", "td", "select", "template",
                                     "title"]))
def test_fast_path_equals_full_parse(text, context):
    fast = fast_extract(text, "fragment", context)
    full = parse_fragment(text, context)
    ext, spans = full.extract_text()
    assert fast == (ext, spans, full.error_count, full.node_count,
                    full.encoding or "UTF-8", full.errors)


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=200))
def test_document_parse_arbitrary_bytes_total(raw):
    # the byte front-end (sniff/decode) must be total on arbitrary bytes
    res = parse_document(raw)
    assert res.doc is not None
    assert isinstance(res.encoding, str)


@settings(max_examples=250, deadline=None)
@given(_html_text, _contexts)
def test_boilerplate_strip_total(text, context):
    from html_parser_spark.kernel.boilerplate import strip_boilerplate

    res = parse_fragment(text, context)
    main_text, spans, kept, total = strip_boilerplate(res.doc)
    assert 0 <= kept <= total
    # spans are ordered, non-overlapping, within bounds
    prev_end = -1
    for s in spans:
        assert 0 <= s["start"] <= s["end"] <= len(main_text)
        assert s["start"] >= prev_end - 1  # block separators add 1 char
        prev_end = s["end"]
    # every span slices cleanly out of the text
    for s in spans:
        assert main_text[s["start"]:s["end"]] is not None


@settings(max_examples=80, deadline=None)
@given(st.integers(1, 24), st.integers(1, 24),
       st.sampled_from([1, 3, 4]), st.randoms())
def test_png_roundtrip_property(w, h, ch, rng):
    from html_parser_spark.spark.multimodal import png_decode, png_encode

    px = bytes(rng.randrange(256) for _ in range(w * h * ch))
    got = png_decode(png_encode(w, h, px, ch))
    assert got == (w, h, ch, px)


@settings(max_examples=60, deadline=None)
@given(st.integers(1, 20), st.integers(1, 20),
       st.integers(2, 32), st.randoms())
def test_gif_roundtrip_property(w, h, ncolors, rng):
    from html_parser_spark.spark.multimodal import gif_decode, gif_encode

    pal = bytes(rng.randrange(256) for _ in range(ncolors * 3))
    idx = bytes(rng.randrange(ncolors) for _ in range(w * h))
    gw, gh, ch, rgb = gif_decode(gif_encode(w, h, idx, pal))
    assert (gw, gh, ch) == (w, h, 3)
    assert rgb == b"".join(pal[i * 3:i * 3 + 3] for i in idx)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(-32768, 32767), min_size=1, max_size=400),
       st.sampled_from([8000, 16000, 44100]))
def test_wav_roundtrip_property(samples, rate):
    from html_parser_spark.spark.multimodal import wav_decode, wav_encode

    got = wav_decode(wav_encode(samples, rate))
    assert got == (rate, 1, samples)


@settings(max_examples=80, deadline=None)
@given(st.lists(st.binary(min_size=0, max_size=300), min_size=1,
                max_size=6),
       st.randoms())
def test_warc_roundtrip_property(payloads, rng):
    """Arbitrary payload bytes (including embedded CRLFCRLF and
    "WARC/" sentinels) frame-roundtrip through the writer and the
    streaming reader, under BOTH the member-per-record layout and an
    adversarial re-chunking of the byte stream into random gzip
    members (Content-Length framing must never scan for sentinels)."""
    from html_parser_spark.spark.warc import (
        build_warc_record, gzip_member, iter_warc_records,
    )

    recs = [build_warc_record("resource", f"<urn:p:{i}>", p)
            for i, p in enumerate(payloads)]
    stream = b"".join(recs)

    def check(parsed):
        assert [pl for _, pl in parsed] == payloads
        assert [h["warc-record-id"] for h, _ in parsed] == \
            [f"<urn:p:{i}>" for i in range(len(payloads))]

    check(list(iter_warc_records(stream)))                   # plain
    check(list(iter_warc_records(                            # CC layout
        b"".join(gzip_member(r) for r in recs))))
    # adversarial member boundaries: cut the stream at random points
    cuts = sorted(rng.sample(range(1, len(stream)),
                             min(len(stream) - 1, rng.randrange(5))))
    chunks = [stream[a:b] for a, b in
              zip([0] + cuts, cuts + [len(stream)])]
    check(list(iter_warc_records(
        b"".join(gzip_member(c) for c in chunks))))
