#!/usr/bin/env python3
"""Pre-flight the driver's correctness gate: run every queries() entry
on Spark at sf0.01 and its oracle_sql() in DuckDB, compare row count,
column names, and order-insensitive values (columns sorted by name).

The oracle side is materialized via DuckDB's pandas bridge
(``res.df()``) — the SAME path the driver uses — so type-bridging
defects (HUGEINT/DECIMAL -> float64 while Spark yields int64/Decimal)
fail HERE instead of only in the driver's value-hash gate. The
round-4 ``corpus_rollup`` red row (uncast ``sum(length(text))``)
passed the old ``fetchall()``-based compare and failed the driver;
this materialization reproduces that failure locally.
"""

from __future__ import annotations

import os
import sys
from decimal import Decimal

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def canon(v):
    # NULL first: engines agree on nullness, only value typing differs.
    if v is None or (not isinstance(v, (list, tuple, np.ndarray))
                     and pd.isna(v)):
        return "None"
    if isinstance(v, Decimal):
        return f"{v.normalize():f}"
    if isinstance(v, bool):
        return str(v)
    # float64 (incl. numpy) formats with decimals; ints format bare —
    # so an int64-vs-float64 bridge mismatch is VISIBLE, as in the
    # driver's hash compare.
    if isinstance(v, float):
        return f"{v:.6f}"
    if isinstance(v, np.integer):
        return str(int(v))
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if hasattr(v, "isoformat"):
        # DuckDB's bridge widens DATE to datetime64[ns] midnight while
        # Spark keeps datetime.date; the driver treats those as equal
        # (events_daily was green in r4), so render midnight-naive
        # datetimes as their date
        if (hasattr(v, "hour") and hasattr(v, "date")
                and v.hour == v.minute == v.second == 0
                and getattr(v, "microsecond", 0) == 0
                and getattr(v, "nanosecond", 0) == 0
                and v.tzinfo is None):
            return v.date().isoformat()
        return v.isoformat()
    return str(v)


def rows_to_set(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        "|".join(canon(r[i]) for i in order) for r in rows
    )


def duck_connect(sf_dir: str):
    """A DuckDB connection with the driver's table views registered."""
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'{sf_dir}/{t}.parquet'"
        )
    return con


def compare_one(spark, con, fn, sql, sf_dir: str):
    """Driver-faithful compare of one queries() entry against its
    oracle SQL. Returns (ok, n_rows, message). Importable so the
    pytest regression (tests/test_oracle_parity.py) and this CLI run
    the SAME comparison."""
    df = fn(spark, sf_dir)
    # pandas materialization on BOTH sides, like the driver: a
    # NULL-bearing int64 column becomes float64 in pandas from either
    # engine (so those match), while a null-free Spark int64 against a
    # DuckDB HUGEINT/DECIMAL float64 does NOT — exactly the driver's
    # observed pass/fail behavior.
    spdf = df.toPandas()
    sdata = list(spdf.itertuples(index=False, name=None))
    scols = list(spdf.columns)
    if sql is None:
        return True, len(sdata), f"{len(sdata)} rows (no oracle)"
    # driver-faithful materialization: pandas .df(), not fetchall() —
    # see module docstring.
    opdf = con.execute(sql).df()
    ocols = list(opdf.columns)
    odata = list(opdf.itertuples(index=False, name=None))
    if sorted(scols) != sorted(ocols):
        return False, len(sdata), (
            f"columns spark={sorted(scols)} duck={sorted(ocols)}")
    if len(sdata) != len(odata):
        return False, len(sdata), (
            f"rows spark={len(sdata)} duck={len(odata)}")
    sset = rows_to_set(scols, sdata)
    oset = rows_to_set(ocols, odata)
    if sset != oset:
        diffs = [(a, b) for a, b in zip(sset, oset) if a != b]
        lines = [f"{len(diffs)} value mismatches; first:"]
        for a, b in diffs[:3]:
            lines.append(f"   spark: {a[:160]}")
            lines.append(f"   duck : {b[:160]}")
        return False, len(sdata), "\n".join(lines)
    return True, len(sdata), f"{len(sdata)} rows"


def main():
    only = sys.argv[1:] or None

    import __spark_entry__ as se
    from html_parser_spark.spark.session import get_spark

    con = duck_connect(SF_DIR)
    spark = get_spark("oracle-check")
    spark.sparkContext.setLogLevel("ERROR")

    qs = se.queries()
    oracles = se.oracle_sql()
    npass = nfail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            ok, nrows, msg = compare_one(
                spark, con, fn, oracles.get(name), SF_DIR)
        except Exception as e:  # noqa: BLE001
            ok, msg = False, f"exception {e!r}"[:500]
        if ok:
            print(f"PASS {name}: {msg}")
            npass += 1
        else:
            print(f"FAIL {name}: {msg}")
            nfail += 1
    print(f"\n{npass} pass, {nfail} fail")
    spark.stop()
    return 1 if nfail else 0


if __name__ == "__main__":
    sys.exit(main())
