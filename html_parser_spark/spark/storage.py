"""Bucketed-table storage helpers: co-located joins without a shuffle.

At 100 TB the dominant cost of repeated joins/aggregations on the same
key is the exchange. Writing both sides bucketed (and sorted) by the
join key lets every subsequent sort-merge join and groupBy on that key
run with ZERO Exchange nodes — the bucketing IS the shuffle, paid once
at write time (the same reasoning as the checkpoint module's
bucket(conv_id) partitioning; on an Iceberg catalog this is the
`bucket(N, key)` partition transform).

test_bucketed_join_has_no_exchange asserts the plan property.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_bucketed(df: DataFrame, table: str, key: str,
                   buckets: int = 16) -> None:
    """Persist as a bucketed+sorted managed table keyed for co-located
    joins (Spark's native bucketing; Iceberg: bucket(N, key))."""
    (
        df.write.mode("overwrite")
        .bucketBy(buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    )


def read_table(spark, table: str) -> DataFrame:
    return spark.table(table)


def compact_parquet(spark, input_path: str, output_path: str,
                    target_file_mb: int = 128) -> int:
    """Small-file compaction — the OPTIMIZE / Iceberg
    rewrite_data_files maintenance operator. A 100 TB table ingested
    by many tasks (or streaming micro-batches) accumulates thousands
    of KB-scale files; every downstream scan then pays per-file open/
    footer costs and the scheduler pays per-split overhead. This
    rewrites the dataset into ceil(total_bytes / target) files of
    roughly `target_file_mb` each.

    Sizing comes from the FILE METADATA the reader already collected
    (InMemoryFileIndex via the JVM Hadoop FS — no data read, and no
    driver-side os.walk that would break on object stores). The
    rewrite is one scan + one round-robin repartition + one write;
    row content is preserved exactly (count-checked by the caller's
    tests). Returns the number of output partitions."""
    import math

    df = spark.read.parquet(input_path)
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(input_path)
    fs = path.getFileSystem(conf)
    total = fs.getContentSummary(path).getLength()
    n_files = max(1, math.ceil(total / (target_file_mb * 1024 * 1024)))
    df.repartition(n_files).write.mode("overwrite").parquet(output_path)
    return n_files


def _strip_nullability(dt):
    """Recursively normalize nullability flags (ArrayType.containsNull,
    MapType.valueContainsNull, StructField.nullable) so schema-drift
    detection compares VALUE types, not the in-memory-vs-parquet
    nullability accidents that union coercion handles anyway."""
    from pyspark.sql import types as T

    if isinstance(dt, T.ArrayType):
        return T.ArrayType(_strip_nullability(dt.elementType), True)
    if isinstance(dt, T.MapType):
        return T.MapType(_strip_nullability(dt.keyType),
                         _strip_nullability(dt.valueType), True)
    if isinstance(dt, T.StructType):
        return T.StructType([
            T.StructField(f.name, _strip_nullability(f.dataType), True)
            for f in dt.fields])
    return dt


def upsert_parquet(spark, target_path: str, updates: DataFrame,
                   key: str) -> int:
    """MERGE-INTO semantics for a plain-parquet target: rows whose
    `key` appears in `updates` are replaced, new keys are inserted,
    untouched rows are preserved (matched-update + not-matched-insert,
    updates win wholesale per key). Realized as existing-rows
    anti-join + union, staged to a temp dir and swapped via Hadoop FS
    rename — the read and the overwrite can't target the same path in
    one job.

    Honesty note on atomicity: a real table format (Iceberg/Delta
    MERGE INTO) commits this as one metadata swap; the parquet-level
    swap here has a small non-atomic window between delete and rename
    (documented trade, same as every bare-parquet pipeline). Returns
    the merged row count."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    Path = jvm.org.apache.hadoop.fs.Path
    target = Path(target_path)
    fs = target.getFileSystem(conf)

    if fs.exists(target):
        existing = spark.read.parquet(target_path)
        # surface schema drift instead of silently dropping extra
        # update columns (or failing deep inside the select/union on
        # missing or retyped ones): MERGE is defined over one schema.
        # Types are compared MODULO nullability: an in-memory updates
        # frame routinely carries containsNull/valueContainsNull/
        # nullable flags differing from the parquet-read schema, and
        # those unions fine — only a genuine retype is drift
        ex_types = {f.name: f.dataType for f in existing.schema.fields}
        up_types = {f.name: f.dataType for f in updates.schema.fields}
        extra = set(up_types) - set(ex_types)
        missing = set(ex_types) - set(up_types)
        retyped = sorted(
            f"{c} ({ex_types[c].simpleString()} -> "
            f"{up_types[c].simpleString()})"
            for c in set(ex_types) & set(up_types)
            if (_strip_nullability(ex_types[c])
                != _strip_nullability(up_types[c]))
        )
        if extra or missing or retyped:
            raise ValueError(
                f"upsert: updates schema drifts from {target_path}: "
                f"extra columns {sorted(extra)}, missing columns "
                f"{sorted(missing)}, retyped columns {retyped}")
        keys = updates.select(key).distinct()
        merged = existing.join(keys, key, "left_anti").unionByName(
            updates.select(*existing.columns))
    else:
        merged = updates
    tmp = Path(target_path + "._upsert_tmp")
    merged.write.mode("overwrite").parquet(str(tmp))
    n = spark.read.parquet(str(tmp)).count()
    _swap_into_place(fs, tmp, target, "upsert")
    return n


def _swap_into_place(fs, staging, target, verb: str) -> None:
    """Shared stage-and-swap: delete the live target (if any), rename
    the staging path in. Hadoop FS delete/rename report failure by
    RETURNING false, not raising — ignoring them would silently lose
    the live table (delete succeeded, rename failed -> data stranded
    in staging)."""
    if fs.exists(target) and not fs.delete(target, True):
        raise IOError(f"{verb}: could not delete {target}")
    if not fs.rename(staging, target):
        raise IOError(
            f"{verb}: rename {staging} -> {target} failed; the new "
            f"data is intact in the staging path")


class TableFormat:
    """Minimal table-format seam: the four maintenance/mutation verbs a
    curation pipeline needs from its storage layer, abstracted so the
    parquet-directory emulation below can be swapped for a real
    transactional format (Iceberg/Delta) without touching callers.

    What a real catalog-backed implementation replaces (see COVERAGE.md
    "Storage" for the full accounting):
      - append/overwrite become ATOMIC snapshot commits (no
        delete+rename window, readers never see a partial table)
      - merge becomes the engine's MERGE INTO (one metadata swap,
        row-level conflict detection)
      - compact becomes rewrite_data_files / OPTIMIZE, committed as a
        snapshot that concurrent readers ignore until publish
      - partitioning becomes hidden partition transforms
        (bucket(N, key), days(ts)) instead of physical directory layout
    """

    def append(self, df: DataFrame, table_path: str) -> None:
        raise NotImplementedError

    def overwrite(self, df: DataFrame, table_path: str) -> None:
        raise NotImplementedError

    def compact(self, spark, table_path: str,
                target_file_mb: int = 128) -> int:
        raise NotImplementedError

    def merge(self, spark, table_path: str, updates: DataFrame,
              key: str) -> int:
        raise NotImplementedError


class ParquetDirFormat(TableFormat):
    """Plain-parquet-directory emulation — the only implementation
    available in this sandbox (no Iceberg/Delta jars). Append relies on
    parquet's append mode; overwrite/merge stage-and-swap via Hadoop FS
    rename with the documented non-atomic window; compact rewrites in
    place-adjacent output the caller swaps in."""

    def append(self, df: DataFrame, table_path: str) -> None:
        df.write.mode("append").parquet(table_path)

    def overwrite(self, df: DataFrame, table_path: str) -> None:
        df.write.mode("overwrite").parquet(table_path)

    def compact(self, spark, table_path: str,
                target_file_mb: int = 128) -> int:
        out = table_path + "._compacted"
        n = compact_parquet(spark, table_path, out, target_file_mb)
        jvm = spark._jvm
        conf = spark._jsc.hadoopConfiguration()
        Path = jvm.org.apache.hadoop.fs.Path
        fs = Path(table_path).getFileSystem(conf)
        _swap_into_place(fs, Path(out), Path(table_path), "compact")
        return n

    def merge(self, spark, table_path: str, updates: DataFrame,
              key: str) -> int:
        return upsert_parquet(spark, table_path, updates, key)
