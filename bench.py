#!/usr/bin/env python3
"""Benchmark harness. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Headline: end-to-end extraction (tokenize + tree-build + extract) over a
deterministic synthetic transcripts table sized by the SF directory,
plus representative relational / dedup / ANN queries on the SF tables.

Env:
  SPARK_GRAFT_SF_DIR  (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    (default 32)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# transcripts turns per SF (scaled: sf0.1 -> 200k turns ~ 23 MB of text)
_SF_TURNS = {"sf0.001": 2_000, "sf0.01": 20_000, "sf0.1": 200_000}


def _sf_name() -> str:
    return os.path.basename(os.path.normpath(SF_DIR))


def _transcripts_path(spark, n_turns: int) -> str:
    """Materialize the synthetic transcripts once per (n, seed); reuse
    across runs so bench times measure the job, not the generator."""
    path = f"/tmp/spark_graft_bench/transcripts_{n_turns}_s42"
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        from html_parser_spark.spark.transcripts import (
            write_transcripts_parquet,
        )

        write_transcripts_parquet(spark, path, n_turns, seed=42,
                                  partitions=max(CPUS, 8))
    return path


def _dense_corpus_path(spark, sf: str):
    """Markup-dense document corpus: the reference fixture HTML files
    replicated to ~5/50 MB (by SF). Returns (path, total_mb)."""
    reps = {"sf0.001": 1, "sf0.01": 8, "sf0.1": 64}.get(sf, 8)
    path = f"/tmp/spark_graft_bench/dense_v4_{reps}"
    meta = path + ".mb"
    if not (os.path.exists(os.path.join(path, "_SUCCESS"))
            and os.path.exists(meta)):
        import datetime

        from pyspark.sql import functions as F

        # the SAME content behind BASELINE.md's 9.77 MB/s single-thread
        # figure (500x tests/big_test.html): ~108 KB documents of
        # 50x big_test each, 10 distinct shells
        body = open("/root/reference/tests/big_test.html",
                    encoding="utf-8").read() * 50
        docs = [
            "<!DOCTYPE html><html><head><title>doc%d</title></head>"
            "<body>%s</body></html>" % (off, body)
            for off in range(10)
        ]
        base = spark.createDataFrame(
            [(f"doc{i:05d}", 0, "user", d, None,
              datetime.datetime(2020, 1, 1)) for i, d in enumerate(docs)],
            "conv_id string, turn_idx int, role string, text string, "
            "tool string, ts timestamp")
        amplified = (
            base.withColumn(
                "rep", F.explode(F.sequence(F.lit(1), F.lit(reps))))
            .withColumn("conv_id", F.concat_ws("_", "conv_id", "rep"))
            # make every replica byte-unique so the worker parse cache
            # cannot shortcut the dense MB/s measurement
            .withColumn("text", F.concat(
                F.col("text"), F.lit("<!--"),
                F.col("rep").cast("string"), F.lit("-->")))
            .drop("rep")
            .repartition(max(CPUS * 2, 16))
        )
        amplified.write.mode("overwrite").parquet(path)
        mb = sum(len(d.encode("utf-8")) for d in docs) * reps / 1e6
        with open(meta, "w") as f:
            f.write(str(mb))
    return path, float(open(meta).read())


def _cpu_calibration() -> float:
    """Fixed single-thread workload (ms): lets readers normalize bench
    numbers across runs on this noisy shared host."""
    import hashlib

    t0 = time.time()
    h = hashlib.sha256()
    for _ in range(20000):
        h.update(b"x" * 1000)
    return round((time.time() - t0) * 1000, 1)


def main() -> int:
    from pyspark.sql import functions as F

    import __spark_entry__ as se
    from html_parser_spark.spark.pipeline import (
        conversation_stats, extract_turns,
    )
    from html_parser_spark.spark.session import get_spark

    spark = get_spark("bench", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")

    sf = _sf_name()
    n_turns = _SF_TURNS.get(sf, 20_000)
    tpath = _transcripts_path(spark, n_turns)
    transcripts = spark.read.parquet(tpath)

    # prep phase (untimed): materialize corpora, free driver heap, warm
    # Python workers + codegen so timings measure the steady state
    dense_path, dense_mb = _dense_corpus_path(spark, sf)
    import gc

    gc.collect()
    # full-size untimed warmup: a limit(512) probe only spins up a
    # couple of Python workers, so the first timed run was paying the
    # other ~30 workers' startup (observed as ~250% first-run spread)
    try:
        extract_turns(transcripts, ordered=False).write.format(
            "noop").mode("overwrite").save()
    except Exception:
        # noop sink unavailable -> same count fallback as _timed
        extract_turns(transcripts, ordered=False).count()

    queries: dict[str, float] = {}
    t_all = time.time()

    # -- headline: extraction ------------------------------------------------
    # noop sink: forces FULL materialization of every output column
    # (count() would let Catalyst prune the computed columns + window).
    # best-of-3: this sandbox is a noisy shared host (same-size walls
    # spread ~2x); min measures the job, not the neighbors.
    extract_times = []
    for _ in range(3):
        t0 = time.time()
        extract_turns(transcripts, ordered=True).write.format(
            "noop").mode("overwrite").save()
        extract_times.append(time.time() - t0)
    t_extract = min(extract_times)
    n_extracted = transcripts.count()
    queries["extract_transcripts"] = round(t_extract, 3)

    t0 = time.time()
    stats = conversation_stats(extract_turns(transcripts, ordered=False))
    n_convs = stats.count()
    queries["conversation_stats"] = round(time.time() - t0, 3)

    # -- markup-dense corpus: apples-to-apples with the reference's
    #    9.77 MB/s single-thread document-parse baseline ------------------
    dense = spark.read.parquet(dense_path)
    dense_times = []
    for i in range(4):
        t0 = time.time()
        extract_turns(dense, mode="document", ordered=False).write.format(
            "noop").mode("overwrite").save()
        if i > 0:  # first run is the untimed worker/codegen warmup
            dense_times.append(time.time() - t0)
    t_dense = min(dense_times)
    queries["extract_html_dense"] = round(t_dense, 3)
    dense_mb_per_sec = round(dense_mb / t_dense, 2) if t_dense else 0.0

    # -- representative SF-table queries -------------------------------------
    # one UNTIMED warmup (scan cache, codegen, Python workers) then
    # best-of-3; the min measures the job, not the neighbors on this
    # noisy shared host. spread_pct = (max-min)/min over the timed
    # runs, recorded per query so a reader can tell a real regression
    # from host noise without rerunning.
    qs = se.queries()
    spread_pct: dict[str, float] = {}

    def _timed(name: str, runs: int = 3) -> float:
        def _go():
            try:
                qs[name](spark, SF_DIR).write.format(
                    "noop").mode("overwrite").save()
            except Exception:
                # noop sink unavailable -> fall back to count
                qs[name](spark, SF_DIR).count()

        _go()  # untimed warmup
        times = []
        for _ in range(runs):
            t0 = time.time()
            _go()
            times.append(time.time() - t0)
        best = min(times)
        spread_pct[name] = round(100.0 * (max(times) - best) / best, 1)
        return best

    for name in ("pricing_summary", "top_revenue", "ordering_window",
                 "exact_dedup", "token_stats", "minhash_lsh",
                 "ann_bruteforce", "simhash"):
        queries[name] = round(_timed(name), 3)

    # snapshot the comparable wall BEFORE the extras: BENCH_r01..r03's
    # wall_seconds_incl_retries measured only the frozen suite
    wall = round(time.time() - t_all, 3)

    # round-4 operators, measured but NOT summed into the headline:
    # the headline query set is frozen for cross-round comparability
    # (BENCH_r01..r03 share it); these report coverage of the newer
    # surface — curation DAG, clustering, temporal join, redaction —
    # without moving the trend line
    extra: dict[str, float] = {}
    for name in ("curate_corpus", "dup_components", "asof_attribution",
                 "redact_pii"):
        if name not in qs:
            continue
        extra[name] = round(_timed(name, runs=2), 3)
        spark.catalog.clearCache()  # curation persists pair-scale frames

    # distributed connected components exercised AT SIZE: a 100k-edge
    # multi-hop chain graph (diameter 20) forced past the union-find
    # threshold, so the min-label propagation loop's iteration count
    # and wall time are on record every round (the SF-table dup graphs
    # stay under the collect threshold and never run this loop)
    from html_parser_spark.spark.ops import _components_min_label

    cc_edges = spark.createDataFrame(
        [(c * 100 + j, c * 100 + j + 1)
         for c in range(5000) for j in range(20)],
        "doc_a long, doc_b long").repartition(CPUS)
    cc_stats: dict = {}
    t0 = time.time()
    _components_min_label(
        cc_edges, collect_max_edges=0, stats=cc_stats).count()
    extra["cc_distributed_100k_edges"] = round(time.time() - t0, 3)
    cc_stats["chain_len"] = 20

    # headline = sum of best-of-N per-query times: measures the suite,
    # not the retry loops (wall clock incl. retries: snapshotted above,
    # extras excluded for cross-round comparability)
    total = round(sum(queries.values()), 3)
    turns_per_sec = round(n_extracted / t_extract, 1) if t_extract else 0.0

    # total text bytes for MB/s context (cheap: sum of lengths)
    text_mb = (
        transcripts.select(
            F.sum(F.length("text")).alias("b")
        ).collect()[0].b or 0
    ) / 1e6

    print(json.dumps({
        "metric": "end_to_end_bench_seconds",
        "value": total,
        "unit": "sec",
        "wall_seconds_incl_retries": wall,
        "queries": queries,
        "query_spread_pct": dict(
            spread_pct,
            extract_transcripts=round(
                100.0 * (max(extract_times) - t_extract) / t_extract, 1),
            extract_html_dense=round(
                100.0 * (max(dense_times) - t_dense) / t_dense, 1),
        ),
        "extra_queries_not_in_value": extra,
        "cc_distributed_info": cc_stats,
        "sf": sf,
        "turns": n_extracted,
        "turns_per_sec": turns_per_sec,
        "transcript_mb": round(text_mb, 2),
        "mb_per_sec": round(text_mb / t_extract, 2) if t_extract else 0.0,
        "dense_html_mb": round(dense_mb, 2),
        "dense_html_mb_per_sec": dense_mb_per_sec,
        "reference_single_thread_mb_per_sec": 9.77,
        "conversations": n_convs,
        "cpus": CPUS,
        "cpu_calibration_ms": _cpu_calibration(),
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
