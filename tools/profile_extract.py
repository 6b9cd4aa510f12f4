#!/usr/bin/env python3
"""Profile the extraction job stage by stage at sf0.1 scale."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

from html_parser_spark.spark.pipeline import (  # noqa: E402
    PASSTHROUGH, _NEEDS_KERNEL, extract_turns,
)
from html_parser_spark.spark.session import get_spark  # noqa: E402
from html_parser_spark.spark.udfs import make_extract_map_in_arrow  # noqa: E402


def t(label, fn):
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    print(f"{label:35s} {dt:7.2f}s  {out}")
    return dt


def main():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("profile", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    path = "/tmp/spark_graft_bench/transcripts_200000_s42"
    df = spark.read.parquet(path)

    t("plain count", lambda: df.count())
    t("plain count again", lambda: df.count())

    needs = F.expr(_NEEDS_KERNEL) & F.col("text").isNotNull()
    t("needs_kernel count", lambda: df.where(needs).count())

    hard = df.where(needs)
    fn = make_extract_map_in_arrow(PASSTHROUGH)
    from html_parser_spark.spark.udfs import EXTRACT_SPARK_SCHEMA
    schema = ("conv_id string, turn_idx int, role string, tool string, "
              "ts timestamp, " + EXTRACT_SPARK_SCHEMA)
    t("hard tier parse count",
      lambda: hard.select(*PASSTHROUGH, "text").mapInArrow(fn, schema).count())
    t("hard tier parse again",
      lambda: hard.select(*PASSTHROUGH, "text").mapInArrow(fn, schema).count())

    t("full extract no window",
      lambda: extract_turns(df, ordered=False).count())
    t("full extract with window",
      lambda: extract_turns(df, ordered=True).count())
    t("full extract with window again",
      lambda: extract_turns(df, ordered=True).count())
    spark.stop()


if __name__ == "__main__":
    main()
