"""Raw-bytes document pipeline (FIXTURES.md §2 `transcripts_raw`).

For corpora where the text column is BINARY with an optional transport
charset hint, the full reference front-end runs inside the kernel:
encoding sniff (BOM > hint > meta-prescan > UTF-8) -> CR/LF+NUL
preprocessing -> document parse with the §13.2.3.5 re-encode handshake.

Schema in : (doc_id string, content binary, charset_hint string)
Schema out: + extracted_text, spans, parse_errors, node_count,
              doc_encoding (the final, possibly re-encoded, name)
"""

from __future__ import annotations

from typing import Iterator

import pyarrow as pa

from ..kernel.api import parse_document
from .udfs import EXTRACT_FIELDS, EXTRACT_SPARK_SCHEMA, SPAN_TYPE

RAW_INPUT_SCHEMA = "doc_id string, content binary, charset_hint string"
RAW_OUTPUT_SCHEMA = "doc_id string, " + EXTRACT_SPARK_SCHEMA


def _kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
    for batch in batches:
        ids = batch.column("doc_id")
        contents = batch.column("content").to_pylist()
        hints = batch.column("charset_hint").to_pylist()
        ext_l, spans_l, errs_l, nodes_l, enc_l, etexts_l = (
            [], [], [], [], [], [])
        for content, hint in zip(contents, hints):
            if content is None:
                ext_l.append("")
                spans_l.append([])
                errs_l.append(0)
                nodes_l.append(0)
                enc_l.append("UTF-8")
                etexts_l.append([])
                continue
            res = parse_document(bytes(content), hint)
            text, spans = res.extract_text()
            ext_l.append(text)
            spans_l.append(spans)
            errs_l.append(res.error_count)
            nodes_l.append(res.node_count)
            enc_l.append(res.encoding or "UTF-8")
            etexts_l.append(res.errors)
        arrays = [ids,
                  pa.array(ext_l, pa.string()),
                  pa.array(spans_l, SPAN_TYPE),
                  pa.array(errs_l, pa.int32()),
                  pa.array(nodes_l, pa.int32()),
                  pa.array(enc_l, pa.string()),
                  pa.array(etexts_l, pa.list_(pa.string()))]
        fields = [batch.schema.field("doc_id")] + EXTRACT_FIELDS
        yield pa.RecordBatch.from_arrays(arrays, schema=pa.schema(fields))


def extract_raw_documents(df):
    """binary documents + charset hints -> extraction columns."""
    return df.select("doc_id", "content", "charset_hint").mapInArrow(
        _kernel, RAW_OUTPUT_SCHEMA
    )
