#!/usr/bin/env python3
"""spark-submit entry point for WARC -> documents-table ingest.

Usage:
  spark-submit --py-files dist/html_parser_spark.zip \
      jobs/warc_ingest_job.py \
      --input  '/crawl/segments/*/warc/*.warc.gz' \
      --output /path/to/documents_out \
      [--min-text-chars 1]

The front half of a web-scale training pipeline: WARC records
(binaryFile, one task per archive — Common Crawl parallelism is file
count) -> HTTP envelope split -> the full reference front-end on the
payload bytes (charset sniff with the transport hint from the HTTP
Content-Type, CR/LF+NUL preprocessing, document parse, main-text
extraction) -> a documents-shaped parquet table
(doc_id, url, source, lang, text, n_chars, parse_errors, doc_encoding)
ready for jobs/curate_job.py.

doc_id is xxhash64 of the WARC record id (stable across re-runs of the
same crawl; 64-bit collisions are ~1e-9 at 10^5 M records — acceptable
for corpus ids, use the record id string itself where they are not).
lang is 'und' here: language ID (ops.lang_id) is a downstream
annotation pass, not an ingest concern.
"""

from __future__ import annotations

import argparse
import json
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--min-text-chars", type=int, default=1)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.builder.appName("warc-ingest").getOrCreate()

    from html_parser_spark.spark.raw_documents import (
        extract_raw_documents,
    )
    from html_parser_spark.spark.warc import (
        read_warc_records, warc_http_responses,
    )

    t0 = time.time()
    responses = warc_http_responses(
        read_warc_records(spark, args.input))
    html = responses.where(
        (F.col("http_status") == 200)
        & (F.col("http_content_type") == "text/html"))
    # target_uri rides THROUGH the Arrow parse stage (passthrough) —
    # a join back against the envelope would re-evaluate the whole
    # WARC read a second time
    parsed = extract_raw_documents(
        html.select(
            F.col("record_id").alias("doc_id"),
            F.col("body").alias("content"),
            "charset_hint", "target_uri"),
        passthrough=("target_uri",))
    docs = (
        parsed.select(
            F.xxhash64("doc_id").alias("doc_id"),
            F.col("target_uri").alias("url"),
            F.regexp_extract("target_uri", r"^[a-z]+://([^/]+)", 1)
            .alias("source"),
            F.lit("und").alias("lang"),
            F.col("extracted_text").alias("text"),
            F.length("extracted_text").alias("n_chars"),
            "parse_errors", "doc_encoding")
        .where(F.col("n_chars") >= args.min_text_chars)
    )
    docs.write.mode("overwrite").parquet(args.output)

    out = spark.read.parquet(args.output)
    stats = {
        "documents": out.count(),
        "seconds": round(time.time() - t0, 1),
    }
    print(json.dumps(stats))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
