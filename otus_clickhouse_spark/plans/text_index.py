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

from pyspark.sql import DataFrame, Window
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


def build_tf_index(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", lowercase: bool = True
) -> DataFrame:
    """Term-frequency posting table ``(token, doc_id, tf)`` — the
    ranked-retrieval sibling of :func:`build_token_index`. One explode
    + one (token, doc) aggregation with map-side partial counts."""
    src = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    toks = F.split(src, r"[^\w]+")
    return (
        df.select(F.col(id_col), F.explode(toks).alias("token"))
        .where(F.length("token") > 0)
        .groupBy("token", id_col)
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def doc_lengths(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", lowercase: bool = True
) -> DataFrame:
    """Per-doc token count ``(id_col, dl)`` computed MAP-SIDE from the
    source text — zero explode, zero shuffle.

    Identical by construction to ``Σ tf`` over :func:`build_tf_index`'s
    output (same split pattern, same lowercase rule, same empty-token
    filter): the sum of per-token counts IS the count of non-empty
    tokens. Feed it to :func:`bm25_topk` as ``dl`` so the ranking never
    aggregates the FULL posting table just to learn document lengths
    (r12, guide §2.4 — the query-term filter pushes below the posting
    groupBy, but the length aggregation used to force the full explode
    + (token, doc) shuffle anyway)."""
    src = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    toks = F.filter(F.split(src, r"[^\w]+"), lambda x: F.length(x) > 0)
    return df.select(F.col(id_col), F.size(toks).cast("bigint").alias("dl"))


def bm25_topk(
    tf_index: DataFrame,
    terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    dl: DataFrame | None = None,
) -> DataFrame:
    """BM25 ranked retrieval over the tf posting table: top-k docs for
    a bag of query terms, ``(doc_id, score, rnk)``.

    Scale shape: the posting filter reduces the index to the query
    terms' rows before anything wide happens; document length and the
    corpus stats (N, avgdl) come from one per-doc aggregation whose
    N/avgdl reduction is a broadcast scalar; the final top-k is
    ``orderBy().limit(k)`` → TakeOrderedAndProject (per-partition
    heaps, no global sort). Deterministic tie-break on doc id.

    ``dl``: precomputed ``(id_col, dl)`` document lengths (see
    :func:`doc_lengths`). Without it the lengths are aggregated from
    the posting table itself — correct, but that forces the FULL index
    explode + shuffle even though scoring only reads the query terms'
    postings.
    """
    terms_l = sorted({t.lower() for t in terms})
    if dl is None:
        dl = tf_index.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    post = tf_index.where(F.col("token").isin(terms_l))
    df_t = post.groupBy("token").agg(F.count_distinct(id_col).alias("df"))
    scored = (
        post.join(F.broadcast(df_t), on="token")
        .join(dl, on=id_col)
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "__idf",
            F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0),
        )
        .withColumn(
            "__s",
            F.col("__idf")
            * (F.col("tf") * (k1 + 1))
            / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))),
        )
        .groupBy(id_col)
        .agg(F.round(F.sum("__s"), 4).alias("score"))
    )
    top = scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)
    w = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
    return top.withColumn("rnk", F.row_number().over(w).cast("bigint"))
