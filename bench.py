"""Benchmark harness (BASELINE.md plan): headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query: 1 warmup + median of 3 timed runs, executed via the noop
sink (full pipeline runs, no driver collect cost). Mirrors the
clickhouse-benchmark repeated-query method (homeworks/hw02.md:108-152).
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

HEADLINE = [
    "q01_pricing_summary",
    "q02_filtered_count",
    "q03_top_orders",
    "q06_range_revenue",
    "q12_asof_join",
    "q14_agg_suite",
    "q21_window_rownum",
    "q25_topk",
    "q31_in_subquery",
    "q40_replacing_final",
    "q65_graphite_rollup",
    "x01_dedup_exact",
    "x02_minhash_pairs",
    "x04_embedding_topk",
    "x05_embedding_lsh_topk",
    "x07_text_stats",
    "x16_curation_pipeline",
    "x17_pii_redaction",
    "x18_sequence_packing",
]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0

    from otus_clickhouse_spark.queries import all_queries
    from otus_clickhouse_spark.session import get_spark

    spark = get_spark(app_name="bench")
    qs = all_queries()

    results: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]

        def run():
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            # pipelines persist() intermediates; drop them so repeated runs
            # don't accumulate cached copies (memory pressure skews timings)
            spark.catalog.clearCache()

        run()  # warmup (JIT/codegen/file listing)
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            run()
            times.append(time.perf_counter() - t0)
        results[name] = round(statistics.median(times), 4)

    total = round(sum(results.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": results,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
