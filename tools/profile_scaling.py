#!/usr/bin/env python3
"""Find the non-scaling component: time each pipeline stage at a given
core count over the amplified corpus (read from parquet, no cache)."""
import json
import os
import subprocess
import sys

REPO = os.path.join(os.path.dirname(__file__), "..")

CODE = r"""
import json, os, sys, time
sys.path.insert(0, %(repo)r)
from pyspark.sql import functions as F
from html_parser_spark.spark.session import get_spark
from html_parser_spark.spark.pipeline import extract_turns, PASSTHROUGH, _NEEDS_KERNEL
from html_parser_spark.spark.udfs import make_extract_map_in_arrow, EXTRACT_SPARK_SCHEMA
cpus = int(sys.argv[1])
spark = get_spark("prof", master=f"local[{cpus}]", shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")
amp = "/tmp/spark_graft_bench/amplified_12800000"
if not os.path.exists(os.path.join(amp, "_SUCCESS")):
    df = spark.read.parquet("/tmp/spark_graft_bench/transcripts_200000_s42")
    df = (df.withColumn("rep", F.explode(F.sequence(F.lit(1), F.lit(64))))
            .withColumn("conv_id", F.concat_ws("_", "conv_id", "rep"))
            .drop("rep").repartition(128))
    df.write.mode("overwrite").parquet(amp)
df = spark.read.parquet(amp)
extract_turns(df.limit(2048), ordered=False).count()
res = {"cpus": cpus}
def t(label, fn):
    t0 = time.time(); fn(); res[label] = round(time.time()-t0, 2)
t("scan_count", lambda: df.count())
needs = F.expr(_NEEDS_KERNEL) & F.col("text").isNotNull()
hard = df.where(needs)
fn_k = make_extract_map_in_arrow(PASSTHROUGH)
schema = ("conv_id string, turn_idx int, role string, tool string, ts timestamp, "
          + EXTRACT_SPARK_SCHEMA)
t("hard_tier", lambda: hard.select(*PASSTHROUGH, "text").mapInArrow(fn_k, schema).count())
t("trivial_tier", lambda: extract_turns(df.where(~needs), ordered=False).count())
t("union_noorder", lambda: extract_turns(df, ordered=False).count())
t("full_window", lambda: extract_turns(df, ordered=True).count())
print(json.dumps(res))
spark.stop()
"""


def main():
    for cpus in (8, 32):
        code = CODE % {"repo": os.path.abspath(REPO)}
        p = subprocess.run([sys.executable, "-c", code, str(cpus)],
                           capture_output=True, text=True, cwd=REPO)
        lines = [ln for ln in p.stdout.splitlines() if ln.startswith("{")]
        print(lines[-1] if lines else p.stderr[-1500:])


if __name__ == "__main__":
    main()
