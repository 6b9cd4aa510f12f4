#!/usr/bin/env python3
"""Pre-flight the driver's correctness gate: run every queries() entry
on Spark at sf0.01 and its oracle_sql() in DuckDB, compare row count,
column names, and order-insensitive values (columns sorted by name).
"""

from __future__ import annotations

import os
import sys
from decimal import Decimal

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def canon(v):
    if isinstance(v, Decimal):
        return f"{v.normalize():f}"
    if isinstance(v, float):
        return f"{v:.6f}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


def rows_to_set(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        "|".join(canon(r[i]) for i in order) for r in rows
    )


def main():
    only = sys.argv[1:] or None
    import duckdb

    import __spark_entry__ as se
    from html_parser_spark.spark.session import get_spark

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'{SF_DIR}/{t}.parquet'"
        )
    spark = get_spark("oracle-check")
    spark.sparkContext.setLogLevel("ERROR")

    qs = se.queries()
    oracles = se.oracle_sql()
    npass = nfail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, SF_DIR)
            sdata = df.collect()
            scols = df.columns
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark exception {e!r}"[:500])
            nfail += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"ROWS {name}: {len(sdata)} rows (no oracle)")
            npass += 1
            continue
        try:
            res = con.execute(sql)
            ocols = [d[0] for d in res.description]
            odata = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb exception {e!r}"[:500])
            nfail += 1
            continue
        ok = True
        if sorted(scols) != sorted(ocols):
            print(f"FAIL {name}: columns spark={sorted(scols)} "
                  f"duck={sorted(ocols)}")
            ok = False
        elif len(sdata) != len(odata):
            print(f"FAIL {name}: rows spark={len(sdata)} duck={len(odata)}")
            ok = False
        else:
            sset = rows_to_set(scols, [tuple(r) for r in sdata])
            oset = rows_to_set(ocols, odata)
            if sset != oset:
                diffs = [(a, b) for a, b in zip(sset, oset) if a != b]
                print(f"FAIL {name}: {len(diffs)} value mismatches; first:")
                for a, b in diffs[:3]:
                    print(f"   spark: {a[:160]}")
                    print(f"   duck : {b[:160]}")
                ok = False
        if ok:
            print(f"PASS {name}: {len(sdata)} rows")
            npass += 1
        else:
            nfail += 1
    print(f"\n{npass} pass, {nfail} fail")
    spark.stop()
    return 1 if nfail else 0


if __name__ == "__main__":
    sys.exit(main())
