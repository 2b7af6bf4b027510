"""A/B a set of Spark confs over a query subset (fresh session per variant).

Usage: python tools/ab_config.py variantA='k=v,k2=v2' variantB='...' -- q1 q2 ...
Each variant runs in its own SparkSession (stopped after), 1 warmup +
median of 3 per query, noop sink.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEFAULT_QS = [
    "q01_pricing_summary", "q03_top_orders", "h09_product_profit",
    "x02_minhash_pairs", "x10_ngram_jaccard_block", "x27_bm25_topk",
    "x43_nb_classifier", "x47_curation_funnel", "x50_passage_retrieval",
    "x55_link_pagerank", "x60_pq_adc_topk", "x68_winnowing_dups",
]


def run_variant(name: str, conf: dict, names: list[str], sf_dir: str) -> dict:
    from otus_clickhouse_spark.queries import all_queries
    from otus_clickhouse_spark.session import get_spark

    spark = get_spark(app_name=f"ab_{name}", extra_conf=conf)
    qs = all_queries()
    res = {}
    for n in names:
        fn = qs[n]

        def run():
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            spark.catalog.clearCache()

        run()
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            run()
            times.append(time.perf_counter() - t0)
        res[n] = round(statistics.median(times), 3)
        print(f"  {name} {n}: {res[n]}", flush=True)
    spark.stop()
    return res


def main():
    args = sys.argv[1:]
    if "--" in args:
        i = args.index("--")
        variants, names = args[:i], args[i + 1 :]
    else:
        variants, names = args, DEFAULT_QS
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    allres = {}
    for v in variants:
        name, _, kvs = v.partition("=")
        conf = {}
        if kvs:
            for kv in kvs.split(","):
                k, _, val = kv.partition("=")
                conf[k] = val
        allres[name] = run_variant(name, conf, names, sf_dir)
    print("\nquery".ljust(34), *[n.ljust(9) for n in allres])
    for q in names:
        print(q.ljust(34), *[f"{allres[n][q]:<9.3f}" for n in allres])
    for n, r in allres.items():
        print(f"TOTAL {n}: {round(sum(r.values()), 2)}")


if __name__ == "__main__":
    main()
