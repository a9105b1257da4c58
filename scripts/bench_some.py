"""Isolated per-query timing harness for the optimization rounds.

Usage: python scripts/bench_some.py [-n N] [--sf DIR] query [query ...]

Runs each named query from ``__spark_entry__.queries()`` through the
same session config as ``bench.py``, with the same sf0.001 warm-up and
the noop sink, but repeats each query N times (default 3) and reports
min/median plus the number of Spark JOBS the final run launched (read
off the DAGScheduler's nextJobId counter — job count is the dominant
cost at toy scale, where per-job scheduler latency swamps compute).

This exists because the shared host's ambient noise inflates single
shots 1.5-4x with a different victim set each run; bench.py's min-of-2
is the driver contract, min-of-N here is the optimization loop's
confirmation tool.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
import __spark_entry__ as entrymod


def _job_counter(spark) -> int:
    v = spark.sparkContext._jsc.sc().dagScheduler().nextJobId()
    # AtomicInteger on some builds, plain int through py4j on others
    return v.get() if hasattr(v, "get") else int(v)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("-n", type=int, default=3)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int, default=int(os.environ.get(
        "SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    spark = bench.build_session(args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    warm_dir = "/root/testdata/sf0.001"

    out = {}
    for name in args.queries:
        spark.sparkContext.setJobDescription(f"warm:{name}")
        try:
            qs[name](spark, warm_dir).write.format("noop") \
                .mode("overwrite").save()
        except Exception as exc:
            print(f"[warm] {name}: {type(exc).__name__}: {exc}",
                  file=sys.stderr)
        times = []
        jobs = -1
        for shot in range(args.n):
            spark.sparkContext.setJobDescription(f"{name}#{shot}")
            j0 = _job_counter(spark)
            t0 = time.perf_counter()
            try:
                qs[name](spark, args.sf).write.format("noop") \
                    .mode("overwrite").save()
                times.append(round(time.perf_counter() - t0, 3))
                jobs = _job_counter(spark) - j0
            except Exception as exc:
                print(f"[run] {name}: {type(exc).__name__}: {exc}",
                      file=sys.stderr)
                times.append(-1.0)
                break
        ok = [t for t in times if t >= 0]
        out[name] = {
            "min": min(ok) if ok else -1.0,
            "med": round(statistics.median(ok), 3) if ok else -1.0,
            "all": times,
            "jobs": jobs,
        }
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"summary": out}))
    spark.stop()


if __name__ == "__main__":
    main()
