#!/usr/bin/env python3
"""spark-submit entry point for the extraction pipeline.

Usage:
  spark-submit --py-files dist/html_parser_spark.zip jobs/extract_job.py \
      --input  /path/to/transcripts_parquet \
      --output /path/to/out \
      --checkpoint /path/to/ckpt \
      [--mode fragment] [--context div] [--boilerplate] [--buckets 64]

The job is resumable: re-running after a failure anti-joins against the
checkpoint manifest and only processes missing partitions
(html_parser_spark/spark/checkpoint.py). Per-partition metrics land in
<checkpoint>/manifest.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--mode", default="fragment",
                    choices=("fragment", "document"))
    ap.add_argument("--context", default="div")
    ap.add_argument("--boilerplate", action="store_true")
    ap.add_argument("--buckets", type=int, default=64)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("html-extract").getOrCreate()

    # imported from the --py-files zip (or the repo on sys.path)
    from html_parser_spark.spark.checkpoint import (
        pending_partitions, with_part_key, write_manifest,
    )
    from html_parser_spark.spark.pipeline import extract_turns

    t0 = time.time()
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    transcripts = spark.read.parquet(args.input)
    keyed = with_part_key(transcripts, args.buckets)
    todo = pending_partitions(keyed, spark, args.checkpoint)
    extracted = extract_turns(
        todo.drop("part_key"), mode=args.mode, context=args.context,
        boilerplate=args.boilerplate,
    )
    extracted = with_part_key(extracted, args.buckets)
    (extracted.write.mode("overwrite")
     .partitionBy("part_key").parquet(args.output))
    done = spark.read.parquet(args.output)
    new_keys = todo.select("part_key").distinct()
    write_manifest(done.join(new_keys, "part_key"), spark, args.checkpoint)
    n = done.count()
    print(json.dumps({
        "job": "html-extract",
        "rows": n,
        "seconds": round(time.time() - t0, 2),
        "output": args.output,
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
