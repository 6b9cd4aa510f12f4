"""JSONL source/sink: the interchange format transcript dumps arrive
in and training shards leave in.

Source: schema-ENFORCED read of newline-delimited JSON transcripts
(PERMISSIVE mode) with corrupt/ill-typed lines quarantined into a
separate frame instead of silently dropped or job-failing — at 100 TB
a malformed producer shard is a certainty and a full-job FAILFAST
abort is the wrong tool; the quarantine frame is the re-ingestion
queue. Sink: one JSON object per line per conversation (the shape a
trainer's data loader streams), written with deterministic conv-hash
sharding.

Both directions stay entirely on Spark's native JSON datasource (JVM
Jackson parse, no Python), so the format boundary costs a scan, not a
UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# transcripts schema per BASELINE.json input_hint, plus the PERMISSIVE
# corrupt-record capture column
_CORRUPT = "_corrupt_record"
TRANSCRIPT_JSONL_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    f"tool string, ts timestamp, {_CORRUPT} string"
)


def read_transcripts_jsonl(spark: SparkSession, path: str):
    """Read newline-delimited JSON transcripts with the canonical
    schema enforced. Returns (good, quarantined):

      good        — rows that parsed clean AND carry the two key
                    fields (conv_id, turn_idx); schema identical to
                    the parquet transcripts source, so every
                    downstream operator is format-agnostic.
      quarantined — the raw offending line per bad row (malformed
                    JSON, or type-bent/keyless records), ready for a
                    re-ingestion queue or producer bug report.

    PERMISSIVE + columnNameOfCorruptRecord is the scale-correct mode:
    DROPMALFORMED silently loses data, FAILFAST turns one bad shard
    into a dead 100 TB job. Spark requires the corrupt-record column
    be reached through a cached/materialization boundary or selected
    together with the data columns — handled here, callers never see
    the footgun."""
    raw = (
        spark.read.schema(TRANSCRIPT_JSONL_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .json(path)
    )
    bad = (F.col(_CORRUPT).isNotNull()
           | F.col("conv_id").isNull() | F.col("turn_idx").isNull())
    good = raw.where(~bad).select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts")
    quarantined = raw.where(bad).select(
        F.coalesce(F.col(_CORRUPT),
                   F.to_json(F.struct("conv_id", "turn_idx", "role",
                                      "text", "tool", "ts")))
        .alias("raw_line"))
    return good, quarantined


def write_chatml_jsonl(rendered: DataFrame, path: str,
                       shards: int = 16) -> None:
    """Training-shard sink: one JSON object per conversation per line
    ({"conv_id", "n_turns", "n_chars", "chatml"}), conv-hash sharded
    so re-runs land each conversation in the same shard (the
    sft_prep_job property). Spark's native JSON writer — JVM-side
    serialization, newline-delimited, splittable on read."""
    (
        rendered.repartition(shards, "conv_id")
        .write.mode("overwrite").json(path)
    )
