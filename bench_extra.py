#!/usr/bin/env python3
"""Round-8 optimization harness (bench.py is FROZEN for measurement;
this file exists for guide §1.4-style isolation work).

Times any subset of the declared queries through the noop sink
(best-of-N after one warmup, same protocol as bench.py) and/or dumps
`.explain("formatted")` for them.  Usage:

  python bench_extra.py time  [query ...]        # all when omitted
  python bench_extra.py plan  [query ...]        # print plans
  python bench_extra.py plandir DIR [query ...]  # write DIR/<q>.txt

Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (same contract as bench.py),
BENCH_EXTRA_RUNS (default 3).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
RUNS = int(os.environ.get("BENCH_EXTRA_RUNS", "3"))

# bench.py's recorded set, in its order (headline + extras)
BENCH_SET = [
    "pricing_summary", "top_revenue", "ordering_window", "exact_dedup",
    "token_stats", "minhash_lsh", "ann_bruteforce", "simhash",
    "curate_corpus", "dup_components", "asof_attribution", "redact_pii",
]


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    cmd = sys.argv[1] if len(sys.argv) > 1 else "time"
    args = sys.argv[2:]
    plandir = None
    if cmd == "plandir":
        plandir, args = args[0], args[1:]

    import __spark_entry__ as se
    from html_parser_spark.spark.session import get_spark

    spark = get_spark("bench_extra", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    qs = se.queries()
    names = args or BENCH_SET
    out: dict = {}
    for name in names:
        if name not in qs:
            print(f"!! unknown query {name}", file=sys.stderr)
            continue
        spark.sparkContext.setJobDescription(name)
        df = qs[name](spark, SF_DIR)
        if cmd in ("plan", "plandir"):
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution
                .ExplainMode.fromString("formatted"))
            if plandir:
                os.makedirs(plandir, exist_ok=True)
                with open(os.path.join(plandir, f"{name}.txt"), "w") as f:
                    f.write(txt)
                print(f"wrote {plandir}/{name}.txt")
            else:
                print(f"==== {name} ====\n{txt}")
            continue
        _noop(df)  # warmup (untimed)
        times = []
        for _ in range(RUNS):
            # TIME THE BUILD TOO, exactly like bench.py's
            # `lambda: _noop(qs[name](spark, SF_DIR))` — for queries
            # with eager driver actions in construction (curate_corpus
            # / dup_components collect their component edges) the build
            # IS the dominant cost; no clearCache between runs, same as
            # the driver's protocol
            t0 = time.time()
            _noop(qs[name](spark, SF_DIR))
            times.append(round(time.time() - t0, 3))
        out[name] = {"best": min(times), "times": times}
        spark.catalog.clearCache()  # bench.py clears after each extra
        print(json.dumps({name: out[name]}))
    if cmd == "time":
        print(json.dumps({"sf": os.path.basename(os.path.normpath(SF_DIR)),
                          "best": {k: v["best"] for k, v in out.items()}}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
