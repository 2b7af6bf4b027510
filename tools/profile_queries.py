"""Per-query profile: build/plan time vs execution time, job/stage counts.

Usage:
    python tools/profile_queries.py [query ...]       # default: bench HEADLINE

For each query (after one warmup), reports over 3 runs the median of:
  build_s  — time to construct the DataFrame (Python + analysis)
  exec_s   — time for the noop write (physical planning + run)
  jobs     — Spark jobs triggered (includes collects inside builders)
  stages   — completed stage count
Writes tools-local JSON to /tmp/profile_queries.json and prints a table.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    names = sys.argv[1:]
    import bench
    from otus_clickhouse_spark.queries import all_queries
    from otus_clickhouse_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="profile_queries")
    sc = spark.sparkContext
    qs = all_queries()
    if not names:
        names = bench.HEADLINE

    tracker = sc.statusTracker()
    out = {}
    for name in names:
        fn = qs[name]

        def one_run():
            j0 = tracker.getJobIdsForGroup(None)
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            spark.catalog.clearCache()
            jobs = sc._jsc.sc().statusTracker().getJobIdsForGroup(None)
            return t1 - t0, t2 - t1

        # count jobs via the JVM AppStatusStore across one run
        def jobs_now():
            return len(sc._jsc.sc().statusTracker().getJobIdsForGroup(None))

        one_run()  # warmup
        builds, execs = [], []
        nj0 = jobs_now()
        for _ in range(3):
            b, e = one_run()
            builds.append(b)
            execs.append(e)
        nj1 = jobs_now()
        out[name] = {
            "build_s": round(statistics.median(builds), 3),
            "exec_s": round(statistics.median(execs), 3),
            "total_s": round(statistics.median(builds) + statistics.median(execs), 3),
            "jobs_per_run": round((nj1 - nj0) / 3, 1),
        }
        r = out[name]
        print(
            f"{name:32s} build {r['build_s']:6.3f}  exec {r['exec_s']:6.3f}"
            f"  total {r['total_s']:6.3f}  jobs/run {r['jobs_per_run']}",
            flush=True,
        )

    with open("/tmp/profile_queries.json", "w") as f:
        json.dump(out, f, indent=1)
    print("total", round(sum(v["total_s"] for v in out.values()), 2))


if __name__ == "__main__":
    main()
