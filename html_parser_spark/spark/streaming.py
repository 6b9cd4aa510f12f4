"""Structured Streaming extraction (SURVEY.md §2.8 notes the reference
has no streaming; this is engine-completeness scaffolding for the
transcripts pipeline: the same extract kernel over readStream).

The parse is stateless per-row, so the streaming plan is just
readStream -> (same tiered extraction) -> writeStream. Ordering windows
are not valid in append-mode streams; ordering is a batch/reader
concern. A watermarked per-conversation rolling aggregate is provided
as the stateful example.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, "
    "ts timestamp"
)


def read_transcripts_stream(spark, input_path: str,
                            max_files_per_trigger: int = 8) -> DataFrame:
    return (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_path)
    )


def extract_stream(df: DataFrame, mode: str = "fragment",
                   context: str = "div") -> DataFrame:
    """Streaming variant of extract_turns: identical tier split +
    kernel; no ordering window (append mode)."""
    from .pipeline import extract_turns

    return extract_turns(df, mode=mode, context=context, ordered=False)


def conversation_rolling_stats(extracted: DataFrame,
                               watermark: str = "10 minutes",
                               window: str = "5 minutes") -> DataFrame:
    """Watermarked windowed per-conversation aggregate (late data beyond
    the watermark is dropped — the standard streaming trade)."""
    return (
        extracted.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), F.col("conv_id"))
        .agg(
            F.count("*").alias("n_turns"),
            F.sum("parse_errors").alias("n_parse_errors"),
            F.sum(F.length("extracted_text")).alias("n_chars"),
        )
    )


def run_stream_to_parquet(spark, input_path: str, output_path: str,
                          checkpoint_path: str, mode: str = "fragment",
                          context: str = "div", available_now: bool = True):
    """Drive the streaming extraction to a parquet sink. available_now
    processes everything present then stops (test/batch-catchup mode)."""
    src = read_transcripts_stream(spark, input_path)
    out = extract_stream(src, mode, context)
    writer = (
        out.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    if available_now:
        q.awaitTermination()
    return q
