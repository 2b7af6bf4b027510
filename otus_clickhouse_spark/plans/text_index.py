"""Token inverted index — the full-text skipping-index analogue.

ClickHouse's ``tokenbf_v1``/``ngrambf_v1`` skip indexes let ``LIKE``/
``hasToken`` predicates skip granules (reference
lectures/lecture_08.md:99-240). Parquet has no token bloom filter, so
the Spark-native equivalent is an explicit posting table
``(token, doc_id)`` — built once, bucketed/partitioned by token at
scale — that prunes the document scan to matching ids via a semi-join
before the (expensive) full-row fetch.

At 100 TB: the index build is one explode + map-side distinct (same
shape as the shingle pipeline); a search touches only the queried
tokens' postings (partition pruning on the token key), and the
candidate id set joins back as a broadcast/semi join — the document
body column is read only for final matches, which is exactly what the
granule-skipping index buys the reference.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_token_index(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", lowercase: bool = True
) -> DataFrame:
    """Posting table (token, doc_id), distinct per doc — map-side dedup
    via array_distinct before the explode (no shuffle)."""
    from otus_clickhouse_spark.io import rebalance

    src = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    toks = F.array_distinct(F.split(src, r"[^\w]+"))
    return (
        rebalance(df, id_col)
        .select(F.explode(toks).alias("token"), F.col(id_col))
        .where(F.length("token") > 0)
    )


def search_all_terms(
    docs: DataFrame, index: DataFrame, terms: list[str], id_col: str = "doc_id"
) -> DataFrame:
    """Docs containing ALL terms (hasToken conjunction).

    Per-term posting lookup → intersection by count — one aggregation
    over only the matching postings; the docs table is then semi-joined
    on the surviving ids.
    """
    terms_l = [t.lower() for t in terms]
    hits = (
        index.where(F.col("token").isin(terms_l))
        .groupBy(id_col)
        .agg(F.count_distinct("token").alias("__nt"))
        .where(F.col("__nt") == len(terms_l))
        .select(id_col)
    )
    return docs.join(hits, on=id_col, how="left_semi")


def search_any_term(
    docs: DataFrame, index: DataFrame, terms: list[str], id_col: str = "doc_id"
) -> DataFrame:
    """Docs containing ANY term (hasToken disjunction)."""
    terms_l = [t.lower() for t in terms]
    hits = index.where(F.col("token").isin(terms_l)).select(id_col).distinct()
    return docs.join(hits, on=id_col, how="left_semi")
