"""Driver-faithful oracle regression (VERDICT r4 item 8).

Round 4's only red CORRECTNESS row was an oracle TYPING defect
(`corpus_rollup`: uncast DuckDB HUGEINT -> float64 under the driver's
pandas materialization, vs Spark int64) that the old fetchall()-based
pre-flight could not see. This test runs every aggregate-bearing
oracle_sql() entry through tools/check_oracles.compare_one — the SAME
pandas-typed comparison the driver uses — at sf0.001, so any new
sum/avg/count-bearing oracle that forgets the bigint/decimal cast
rule (__spark_entry__.py `oracle_sql` docstring) fails HERE before it
reaches the driver.
"""

import os
import re
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

SF_DIR = "/root/testdata/sf0.001"

_AGG_RE = re.compile(
    r"\b(sum|count|avg|min|max|quantile_cont|median|stddev)\s*\(",
    re.IGNORECASE,
)


def _agg_oracle_names():
    import __spark_entry__ as se

    return sorted(
        name for name, sql in se.oracle_sql().items()
        if _AGG_RE.search(sql)
    )


@pytest.fixture(scope="module")
def duck():
    if not os.path.isdir(SF_DIR):
        pytest.skip("testdata sf0.001 unavailable")
    from check_oracles import duck_connect

    con = duck_connect(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", _agg_oracle_names())
def test_aggregate_oracle_driver_typing(spark, duck, name):
    import __spark_entry__ as se
    from check_oracles import compare_one

    ok, nrows, msg = compare_one(
        spark, duck, se.queries()[name], se.oracle_sql()[name], SF_DIR
    )
    assert ok, f"{name}: {msg}"
    assert nrows >= 0
