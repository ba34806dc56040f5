"""Extra benchmarks for the optimization rounds (bench.py is frozen for
measurement — this file is where noop-sink isolation, per-query plan dumps
and ad-hoc before/after numbers live; see guide §1.4).

Usage:
  python bench_extra.py time [query ...]       # per-query wall (same protocol
                                               # as bench.py: construct+count,
                                               # min of N reps, warmed workers)
  python bench_extra.py plans [query ...]      # dump .explain("formatted") to
                                               # plans/r06/<query>_<tag>.txt
  python bench_extra.py noop [query ...]       # noop-sink full-materialization
                                               # timing (every column computed)

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS,
     BENCH_EXTRA_REPS (default 3), BENCH_EXTRA_TAG (plan filename suffix,
     default "before").
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("BENCH_EXTRA_REPS", "3"))
TAG = os.environ.get("BENCH_EXTRA_TAG", "before")

HEADLINE = [
    "encdec_events",
    "encdec_lineitem",
    "encdec_documents",
    "tpch_q1",
    "stack_drift_orders",
    "dedup_exact",
    "token_count",
    "fingerprint",
    "minhash_lsh_pairs",
    "knn_bruteforce",
    "mode_event_type",
    "sessionize",
    "topk_part_revenue",
]


def log(msg: str):
    print(msg, file=sys.stderr, flush=True)


def _spark():
    import bench

    return bench._spark(CPUS)


def _queries():
    import bench
    import __spark_entry__ as entry_mod

    qs = dict(entry_mod.queries())
    qs["minhash_lsh_pairs"] = bench._production_minhash
    return qs


def cmd_time(names):
    import bench

    spark = _spark()
    spark.range(10).count()
    bench._warm_python_workers(spark, CPUS)
    qs = _queries()
    times: dict[str, float] = {}
    for rep in range(REPS):
        for name in names:
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            n = qs[name](spark, SF_DIR).count()
            dt = round(time.time() - t0, 3)
            if name not in times or dt < times[name]:
                times[name] = dt
            log(f"  rep{rep} {name}: {dt}s ({n} rows)")
    total = round(sum(times.values()), 3)
    print(json.dumps({"sf_dir": SF_DIR, "queries": times, "total": total}))
    spark.stop()


def cmd_noop(names):
    import bench

    spark = _spark()
    spark.range(10).count()
    bench._warm_python_workers(spark, CPUS)
    qs = _queries()
    times: dict[str, float] = {}
    for rep in range(REPS):
        for name in names:
            spark.sparkContext.setJobDescription(f"bench_extra_noop:{name}")
            t0 = time.time()
            qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            dt = round(time.time() - t0, 3)
            if name not in times or dt < times[name]:
                times[name] = dt
            log(f"  rep{rep} {name} (noop): {dt}s")
    print(json.dumps({"sf_dir": SF_DIR, "mode": "noop", "queries": times}))
    spark.stop()


def cmd_plans(names):
    import bench

    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r06")
    os.makedirs(out_dir, exist_ok=True)
    spark = _spark()
    spark.range(10).count()
    bench._warm_python_workers(spark, CPUS)
    qs = _queries()
    for name in names:
        df = qs[name](spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        p = os.path.join(out_dir, f"{name}_{TAG}.txt")
        with open(p, "w") as f:
            f.write(buf.getvalue())
        log(f"  wrote {p}")
    spark.stop()


def main():
    if len(sys.argv) < 2 or sys.argv[1] not in ("time", "plans", "noop"):
        raise SystemExit(__doc__)
    names = sys.argv[2:] or HEADLINE
    {"time": cmd_time, "plans": cmd_plans, "noop": cmd_noop}[sys.argv[1]](names)


if __name__ == "__main__":
    main()
