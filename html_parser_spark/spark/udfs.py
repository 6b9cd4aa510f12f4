"""Vectorized Arrow parse kernels (no per-row Python UDFs).

The fused tokenize+tree-build kernel is inherently per-row sequential
(tokenizer<->builder feedback, SURVEY.md §3.4), so it runs inside
``mapInArrow`` batches: one JVM<->Python crossing per record batch,
row-sequential inside. Module-level imports load the entity/encoding
tables once per Python worker (mirror of entities_load_once,
src/tokenizer.c:304) — never per row.

Fast path: turns whose text contains no '<' can skip the parser
entirely — in fragment mode the whole text is one CHARACTER token whose
charref-decoded value either becomes the single TEXT node (non-ws) or
is dropped (ws-only). ``fast_extract`` reproduces that exactly;
tests/test_kernel_units.py and tests/test_properties.py property-check
it against the full parse.
"""

from __future__ import annotations

import os

from typing import Iterator

import pyarrow as pa

from ..kernel.api import parse_document, parse_fragment
from ..kernel.boilerplate import strip_boilerplate, _Block, _score
from ..kernel.charref import decode_character_references
from ..kernel.tokenizer import replace_nulls

_WS_ONLY = frozenset(" \n\t\r\f")
_WS_STR = " \n\t\r\f"

# Arrow output schema of the parse kernel (append-only contract)
SPAN_TYPE = pa.list_(
    pa.struct([
        pa.field("start", pa.int32()),
        pa.field("end", pa.int32()),
        pa.field("path", pa.string()),
    ])
)

EXTRACT_FIELDS = [
    pa.field("extracted_text", pa.string()),
    pa.field("spans", SPAN_TYPE),
    pa.field("parse_errors", pa.int32()),
    pa.field("node_count", pa.int32()),
    pa.field("doc_encoding", pa.string()),
    # the reference's stderr texts minus the "[parse error] " prefix,
    # chronological (tokenizer lines positioned "line=N col=M: msg";
    # tree-builder/charref lines bare) — S5/T15 text parity
    pa.field("parse_error_texts", pa.list_(pa.string())),
]

EXTRACT_SPARK_SCHEMA = (
    "extracted_text string, "
    "spans array<struct<start:int,end:int,path:string>>, "
    "parse_errors int, node_count int, doc_encoding string, "
    "parse_error_texts array<string>"
)


# RAWTEXT/script/plaintext contexts must take the full parser even for
# '<'-free text (they do NOT decode character references); RCDATA
# (title/textarea) decodes like DATA and is fast-path safe.
_RAW_CONTEXTS = frozenset(
    ("script", "style", "xmp", "iframe", "noembed", "noframes", "plaintext")
)

_CALIBRATION: dict = {}


def _calibrate(mode: str, context: str):
    """Constants of a '<'-free parse for this (mode, context): the text
    itself only contributes null/charref errors; everything else — EOF
    parse errors (count AND texts), node counts, the span path,
    encoding — is fixed by the context. Derived by running the full
    parser on probes. The constant texts must be position-free (no
    'line=' prefix) or they couldn't be constants; asserted here —
    every shipped context satisfies it because '<'-free probes only
    produce tree-builder/charref errors, which carry no position."""
    key = (mode, context)
    cached = _CALIBRATION.get(key)
    if cached is not None:
        return cached
    if mode == "document":
        probe = lambda s: parse_document(s)  # noqa: E731
    else:
        probe = lambda s: parse_fragment(s, context)  # noqa: E731
    r_empty = probe("")
    r_ws = probe(" ")
    r_x = probe("x")
    for r in (r_empty, r_ws, r_x):
        assert not any(t.startswith("line=") for t in r.errors), (
            mode, context, r.errors)
    _, spans = r_x.extract_text()
    path = spans[0]["path"] if spans else ""
    cal = (
        (r_empty.error_count, r_empty.node_count,
         r_empty.encoding or "UTF-8", tuple(r_empty.errors)),
        (r_ws.error_count, r_ws.node_count, tuple(r_ws.errors)),
        (r_x.error_count, r_x.node_count, path, tuple(r_x.errors)),
    )
    _CALIBRATION[key] = cal
    return cal


def fast_extract(text: str, mode: str = "fragment", context: str = "div"):
    """Extraction result for a '<'-free turn, byte-equal to the full
    parse: charref-decode the single CHARACTER run; ws-only runs are
    dropped (B23). Returns (extracted_text, spans, errors, nodes, enc,
    error_texts). Error-text order mirrors the full parse: preprocess
    null errors (positioned), then charref errors emitted while
    tokenizing the single CHARACTER run, then the context-constant
    tree-builder errors."""
    (k_empty, n_empty, enc, t_empty), (k_ws, n_ws, t_ws), \
        (k_x, n_x, path, t_x) = _calibrate(mode, context)
    errors: list = []
    clean = replace_nulls(text, errors)
    if not clean:
        return "", [], k_empty, n_empty, enc, list(t_empty)
    decoded = decode_character_references(clean, False, errors)
    if not decoded.strip(_WS_STR):
        return ("", [], k_ws + len(errors), n_ws, enc,
                errors + list(t_ws))
    return (
        decoded,
        [{"start": 0, "end": len(decoded), "path": path}],
        k_x + len(errors),
        n_x,
        enc,
        errors + list(t_x),
    )


def parse_turn(text: str, mode: str = "fragment", context: str = "div",
               boilerplate: bool = False):
    """Full parse of one turn. Returns the 6-tuple matching
    EXTRACT_FIELDS. With boilerplate=True the extraction applies the
    DOM block-scoring strip (kernel/boilerplate.py) instead of verbatim
    TEXT-node concatenation."""
    if text is None:
        return "", [], 0, 0, "UTF-8", []
    if "<" not in text and context not in _RAW_CONTEXTS:
        if not boilerplate:
            return fast_extract(text, mode, context)
        return _fast_extract_boilerplate(text, mode, context)
    if mode == "document":
        res = parse_document(text)
    else:
        res = parse_fragment(text, context)
    if boilerplate:
        ext, spans, _, _ = strip_boilerplate(res.doc)
    else:
        ext, spans = res.extract_text()
    return (ext, spans, res.error_count, res.node_count,
            res.encoding or "UTF-8", res.errors)


def _fast_extract_boilerplate(text: str, mode: str, context: str):
    """'<'-free turn under boilerplate mode: the document is a single
    text block; apply the same block scoring as strip_boilerplate."""
    ext, spans, errs, nodes, enc, texts = fast_extract(text, mode, context)
    if not ext:
        return ext, spans, errs, nodes, enc, texts
    block = _Block()
    block.add(ext, spans[0]["path"] if spans else "", False)
    if _score(block):
        return ext, spans, errs, nodes, enc, texts
    return "", [], errs, nodes, enc, texts


# Worker-level content-addressed parse cache: web/transcript corpora
# carry high duplicate rates (repeated boilerplate turns, quoted
# messages); the parser is deterministic, so identical (text, mode,
# context) re-parses are pure waste. Results are only serialized to
# Arrow (never mutated), so sharing them is safe. A plain module dict
# (not functools.lru_cache) so the mapInArrow closure stays picklable.
# HP_PARSE_CACHE=0 disables; size via HP_PARSE_CACHE_SIZE.
_CACHE_SIZE = int(os.environ.get("HP_PARSE_CACHE_SIZE", "4096"))
_CACHE_ON = os.environ.get("HP_PARSE_CACHE", "1") != "0" and _CACHE_SIZE > 0
_PARSE_CACHE: dict = {}


def _parse_turn_cached(text, mode, context, boilerplate):
    if not _CACHE_ON:
        return parse_turn(text, mode, context, boilerplate)
    key = (text, mode, context, boilerplate)
    hit = _PARSE_CACHE.get(key)
    if hit is not None:
        return hit
    res = parse_turn(text, mode, context, boilerplate)
    if len(_PARSE_CACHE) >= _CACHE_SIZE:
        _PARSE_CACHE.clear()
    _PARSE_CACHE[key] = res
    return res


def _spans_array(spans_l) -> pa.ListArray:
    """Build the list<struct<start,end,path>> column from flat typed
    arrays + offsets. pa.array() on a list of per-row dict lists costs
    ~15us/row (it type-infers and boxes every dict); the flat build is
    ~10x cheaper and dominates the whole Python stage's cost for
    markup-free turns (the parse itself is <1us on the fast path)."""
    offsets = [0]
    starts: list = []
    ends: list = []
    paths: list = []
    ap_o = offsets.append
    ap_s, ap_e, ap_p = starts.append, ends.append, paths.append
    total = 0
    for spans in spans_l:
        total += len(spans)
        ap_o(total)
        for sp in spans:
            ap_s(sp["start"])
            ap_e(sp["end"])
            ap_p(sp["path"])
    struct = pa.StructArray.from_arrays(
        [pa.array(starts, pa.int32()), pa.array(ends, pa.int32()),
         pa.array(paths, pa.string())],
        ["start", "end", "path"])
    return pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), struct)


def _str_list_array(lists_l) -> pa.ListArray:
    """list<string> column from flat values + offsets (same ~100x win
    over pa.array's per-row boxing as _spans_array)."""
    offsets = [0]
    vals: list = []
    total = 0
    ap = offsets.append
    ext = vals.extend
    for xs in lists_l:
        total += len(xs)
        ap(total)
        ext(xs)
    return pa.ListArray.from_arrays(
        pa.array(offsets, pa.int32()), pa.array(vals, pa.string()))


def make_extract_map_in_arrow(passthrough: list[str], mode: str = "fragment",
                              context: str = "div",
                              boilerplate: bool = False):
    """Build a mapInArrow function: passthrough columns + text ->
    passthrough columns + EXTRACT_FIELDS."""

    def _fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            texts = batch.column("text").to_pylist()
            ext_l, spans_l, errs_l, nodes_l, enc_l, etexts_l = (
                [], [], [], [], [], [])
            for text in texts:
                ext, spans, errs, nodes, enc, etexts = _parse_turn_cached(
                    text, mode, context, boilerplate)
                ext_l.append(ext)
                spans_l.append(spans)
                errs_l.append(errs)
                nodes_l.append(nodes)
                enc_l.append(enc)
                etexts_l.append(etexts)
            arrays = [batch.column(c) for c in passthrough]
            fields = [batch.schema.field(c) for c in passthrough]
            arrays += [
                pa.array(ext_l, pa.string()),
                _spans_array(spans_l),
                pa.array(errs_l, pa.int32()),
                pa.array(nodes_l, pa.int32()),
                pa.array(enc_l, pa.string()),
                _str_list_array(etexts_l),
            ]
            fields += EXTRACT_FIELDS
            yield pa.RecordBatch.from_arrays(arrays, schema=pa.schema(fields))

    return _fn


def make_dump_map_in_arrow(passthrough: list[str], mode: str = "fragment",
                           context: str = "div"):
    """Debug/equality variant: adds dump + serialized columns (used by
    the golden-equality tests; too heavy for the production path)."""

    def _fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            texts = batch.column("text").to_pylist()
            dumps, sers, exts, errs = [], [], [], []
            for text in texts:
                text = text or ""
                if mode == "document":
                    res = parse_document(text)
                else:
                    res = parse_fragment(text, context)
                dumps.append(res.dump())
                sers.append(res.serialize())
                exts.append(res.extract_text()[0])
                errs.append(res.error_count)
            arrays = [batch.column(c) for c in passthrough]
            fields = [batch.schema.field(c) for c in passthrough]
            arrays += [
                pa.array(dumps, pa.string()),
                pa.array(sers, pa.string()),
                pa.array(exts, pa.string()),
                pa.array(errs, pa.int32()),
            ]
            fields += [
                pa.field("dump", pa.string()),
                pa.field("serialized_html", pa.string()),
                pa.field("extracted_text", pa.string()),
                pa.field("parse_errors", pa.int32()),
            ]
            yield pa.RecordBatch.from_arrays(arrays, schema=pa.schema(fields))

    return _fn


def make_links_map_in_arrow(passthrough: list[str], mode: str = "fragment",
                            context: str = "div"):
    """Anchor/link extraction kernel: one OUTPUT row per <a href>
    found in each turn (variable fan-out — a mapInArrow batch may grow
    or shrink), passthrough keys repeated per link, link_idx = document
    order within the turn.  Same single-Python-stage shape as the
    extraction kernel."""
    from html_parser_spark.kernel.extract import collect_links

    def _fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            texts = batch.column("text").to_pylist()
            pt_cols = [batch.column(c).to_pylist() for c in passthrough]
            out_pt = [[] for _ in passthrough]
            idxs, hrefs, anchors = [], [], []
            for row, text in enumerate(texts):
                text = text or ""
                if mode == "document":
                    res = parse_document(text)
                else:
                    res = parse_fragment(text, context)
                for k, (href, anchor) in enumerate(
                        collect_links(res.doc)):
                    for c, col in enumerate(pt_cols):
                        out_pt[c].append(col[row])
                    idxs.append(k)
                    hrefs.append(href)
                    anchors.append(anchor)
            fields = [batch.schema.field(c) for c in passthrough]
            arrays = [pa.array(vals, f.type)
                      for vals, f in zip(out_pt, fields)]
            arrays += [
                pa.array(idxs, pa.int32()),
                pa.array(hrefs, pa.string()),
                pa.array(anchors, pa.string()),
            ]
            fields += [
                pa.field("link_idx", pa.int32()),
                pa.field("href", pa.string()),
                pa.field("anchor_text", pa.string()),
            ]
            yield pa.RecordBatch.from_arrays(arrays,
                                             schema=pa.schema(fields))

    return _fn
