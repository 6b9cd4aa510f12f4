#!/usr/bin/env python3
"""Smoke test: extraction pipeline row-equivalence vs direct kernel calls."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

from html_parser_spark.spark.session import get_spark  # noqa: E402
from html_parser_spark.spark.transcripts import transcripts_df  # noqa: E402
from html_parser_spark.spark.pipeline import (  # noqa: E402
    conversation_stats, extract_turns,
)
from html_parser_spark.spark.udfs import parse_turn  # noqa: E402


def main():
    spark = get_spark("smoke")
    spark.sparkContext.setLogLevel("ERROR")

    r = spark.sql("select instr('a b', chr(0)) as i").collect()[0]
    print("instr chr(0) on plain text:", r.i)

    df = transcripts_df(spark, 400, seed=42, partitions=4)
    out = extract_turns(df).cache()
    n = out.count()
    print("extracted rows:", n)

    rows = out.select("conv_id", "turn_idx", "extracted_text",
                      "parse_errors", "node_count").collect()
    src = {(x.conv_id, x.turn_idx): x.text for x in df.collect()}
    bad = 0
    for row in rows:
        text = src[(row.conv_id, row.turn_idx)]
        ext, spans, errs, nodes, enc, _etexts = parse_turn(text)
        if (ext, errs, nodes) != (row.extracted_text, row.parse_errors,
                                  row.node_count):
            bad += 1
            if bad <= 3:
                print("MISMATCH", repr(text)[:70])
                print("  spark:", (row.extracted_text[:40],
                                   row.parse_errors, row.node_count))
                print("  kernel:", (ext[:40], errs, nodes))
    print(f"pipeline-vs-kernel mismatches: {bad} / {n}")

    cs = conversation_stats(out)
    print("conv stats rows:", cs.count())
    print(cs.orderBy("conv_id").first())
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
