"""Partition-level checkpoint manifest + idempotent resume.

North-rule requirement: "checkpointed per Iceberg partition with
lineage and per-partition extraction metrics so the pipeline resumes
idempotently after failure."

Local realization (no Iceberg catalog in this sandbox, same mechanics):
  - work is keyed by a PARTITION KEY column (e.g. bucket of conv_id);
  - each completed partition writes a manifest row
    (part_key, turns, parse_errors, extracted_chars, status=done);
  - resume = left_anti join of input partitions against done manifest
    rows, so a restarted job only processes missing partitions;
  - output written partitioned by part_key -> a re-run overwrites a
    partition atomically (dynamic partition overwrite), making resume
    idempotent rather than duplicating.

Mapping onto a real Iceberg catalog (what each piece becomes):
  - the part_key-partitioned parquet dir -> an Iceberg table
    partitioned by `bucket(conv_id, N)`; `partitionOverwriteMode=
    dynamic` -> `INSERT OVERWRITE` / `replaceWhere` on that partition
    spec, which Iceberg commits atomically per snapshot, so a re-run
    of a partition is a metadata-level swap, never a partial state;
  - the manifest parquet -> either Iceberg's own snapshot/manifest
    metadata (partition-level stats come free) or a small side table
    written in the SAME transaction via multi-table commit; the
    resume anti-join then reads committed snapshots only, so a crash
    between data write and manifest append cannot mark an incomplete
    partition done (Iceberg's commit is the atomicity boundary; in
    the parquet realization the manifest append IS the commit point,
    and re-running a crashed partition merely overwrites it);
  - the partition-pruned metric read-back -> a snapshot-scoped scan
    (`VERSION AS OF` the just-committed snapshot) with partition
    predicates, which Iceberg serves from manifest metadata without
    listing the table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_part_key(df: DataFrame, buckets: int = 64) -> DataFrame:
    """Stable partition key: hash-bucket of conv_id. All turns of one
    conversation land in one bucket (lineage unit)."""
    return df.withColumn(
        "part_key", (F.abs(F.xxhash64("conv_id")) % buckets).cast("int")
    )


def manifest_path(checkpoint_dir: str) -> str:
    return os.path.join(checkpoint_dir, "manifest")


def read_done_keys(spark, checkpoint_dir: str) -> DataFrame:
    path = manifest_path(checkpoint_dir)
    try:
        m = spark.read.parquet(path)
        return m.where(F.col("status") == "done").select("part_key").distinct()
    except Exception:
        return spark.createDataFrame([], "part_key int")


def pending_partitions(df_with_key: DataFrame, spark,
                       checkpoint_dir: str) -> DataFrame:
    """Idempotent resume: drop partitions already marked done."""
    done = read_done_keys(spark, checkpoint_dir)
    return df_with_key.join(done, on="part_key", how="left_anti")


def write_manifest(extracted_with_key: DataFrame, spark,
                   checkpoint_dir: str) -> None:
    """Append per-partition metrics + done markers (lineage record).
    Uses the precomputed `n_chars` column when present so the metric
    scan never has to materialize the (wide) extracted_text column."""
    chars = (
        F.sum("n_chars")
        if "n_chars" in extracted_with_key.columns
        else F.sum(F.length("extracted_text"))
    )
    metrics = (
        extracted_with_key.groupBy("part_key")
        .agg(
            F.count("*").alias("turns"),
            F.sum("parse_errors").alias("parse_errors"),
            chars.alias("extracted_chars"),
            F.countDistinct("conv_id").alias("conversations"),
        )
        .withColumn("status", F.lit("done"))
    )
    metrics.write.mode("append").parquet(manifest_path(checkpoint_dir))


def run_with_checkpoint(spark, transcripts: DataFrame, out_dir: str,
                        checkpoint_dir: str, buckets: int = 64,
                        mode: str = "fragment", context: str = "div",
                        boilerplate: bool = False):
    """End-to-end resumable extraction: key -> resume-filter -> extract
    -> write partitioned by part_key -> manifest append."""
    from .pipeline import extract_turns

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    keyed = with_part_key(transcripts, buckets)
    todo = pending_partitions(keyed, spark, checkpoint_dir)
    extracted = extract_turns(todo.drop("part_key"), mode, context,
                              boilerplate=boilerplate)
    extracted = with_part_key(extracted, buckets).withColumn(
        "n_chars", F.length("extracted_text").cast("bigint")
    )
    out_path = os.path.join(out_dir, "extracted")
    # Collect the pending part keys BEFORE the write: they're
    # metadata-scale (<= `buckets` values, column-pruned to part_key,
    # no kernel run), and collecting first means the write is the LAST
    # evaluation of the todo lineage — nothing re-executes after it.
    new_keys = [
        r.part_key for r in todo.select("part_key").distinct().collect()
    ]
    (extracted.write.mode("overwrite")
     .partitionBy("part_key")
     .parquet(out_path))
    # Manifest metrics come from THIS run's committed files only: the
    # read-back is partition-pruned to exactly the new keys plus
    # column-pruned to the small metric columns (n_chars precomputed at
    # write time so extracted_text is never re-read). Never a full scan
    # of the cumulative output, and no second run of the parse kernel.
    if new_keys:
        done = spark.read.parquet(out_path).where(
            F.col("part_key").isin(new_keys)
        ).select("part_key", "conv_id", "parse_errors", "n_chars")
        write_manifest(done, spark, checkpoint_dir)
    return out_path
