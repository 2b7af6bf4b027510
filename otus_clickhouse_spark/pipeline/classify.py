"""Classifier-style curation operators: Naive Bayes text scoring and
embedding kNN label propagation.

Real curation pipelines (DCLM, Dolma, fastText-quality filtering) put a
cheap linear classifier between heuristics and the expensive model
pass. Multinomial Naive Bayes is the aggregation-shaped member of that
family: training is two groupBys over (class, token) counts, the model
is a small dense (vocab × classes) table that broadcasts, and scoring
is one explode + broadcast join + per-doc sum — no UDFs, no shuffle of
document bodies, and every step is expressible in portable SQL so the
DuckDB oracle can replay it bit-for-bit.

Scale notes (100 TB regime):
- The model table is |vocab| × |classes| rows of ~24 bytes. With a
  ``max_vocab`` cap (document-frequency top-N, the standard trick) it
  stays broadcastable no matter the corpus size.
- Training shuffles (class, token) partial counts — two-phase
  HashAggregate, so shuffle volume tracks distinct tokens, not corpus
  tokens.
- Scoring is map-side after the broadcast: the only shuffle is the
  per-(doc, class) partial-sum aggregate keyed by doc_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from otus_clickhouse_spark.pipeline.similarity import cosine, dot, norm
from otus_clickhouse_spark.io import rebalance


def _tokens(df: DataFrame, text_col: str, id_col: str, label_col: str | None) -> DataFrame:
    cols = [F.col(id_col)] + ([F.col(label_col)] if label_col else [])
    return (
        df.select(*cols, F.explode(F.split(F.col(text_col), " ")).alias("token"))
        .where(F.length("token") > 0)
    )


def naive_bayes_train(
    train: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    id_col: str = "doc_id",
    max_vocab: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Train multinomial NB with add-one smoothing.

    Returns ``(model, priors)``:
      model  = (token, label, logp) — dense over vocab × classes so
               scoring needs no per-class OOV fallback logic;
      priors = (label, logprior).

    ``max_vocab`` keeps only the top-N tokens by document frequency
    (ties broken lexically) — the knob that bounds the broadcast at
    corpus scale.
    """
    toks = _tokens(train, text_col, id_col, label_col)

    if max_vocab is not None:
        df_counts = toks.select("token", id_col).distinct().groupBy("token").agg(
            F.count(F.lit(1)).alias("df")
        )
        # orderBy+limit compiles to TakeOrderedAndProject — each partition
        # keeps its local top-N, then one merge of N-row heaps. Never a
        # single-task global sort over the whole vocabulary (which an
        # unpartitioned Window.orderBy row_number would be at 100 TB).
        vocab = (
            df_counts.orderBy(F.col("df").desc(), F.col("token").asc())
            .limit(max_vocab)
            .select("token")
        )
        toks = toks.join(F.broadcast(vocab), "token")

    # class-conditional token counts and totals
    cnt = toks.groupBy(label_col, "token").agg(F.count(F.lit(1)).alias("cnt"))
    if max_vocab is None:
        # every vocab token appears in cnt with >= 1 class — derive the
        # vocab from the AGGREGATED relation instead of a second full
        # scan + distinct of the exploded token stream (r12, guide
        # §2.4: same set, one less corpus-sized pass)
        vocab = cnt.select("token").distinct()
    tot = cnt.groupBy(label_col).agg(F.sum("cnt").alias("tot"))
    v_size = vocab.agg(F.count(F.lit(1)).alias("v"))

    # dense vocab × classes grid (smoothed zero counts included)
    grid = vocab.crossJoin(F.broadcast(tot.select(label_col, "tot"))).join(
        cnt, ["token", label_col], "left"
    )
    model = grid.crossJoin(F.broadcast(v_size)).select(
        "token",
        label_col,
        F.log((F.coalesce(F.col("cnt"), F.lit(0)) + 1.0) / (F.col("tot") + F.col("v"))).alias(
            "logp"
        ),
    )

    docs = train.groupBy(label_col).agg(F.count(F.lit(1)).alias("n_docs"))
    # total training docs = Σ of the per-class counts — an unpartitioned
    # window over the |classes|-row aggregate (bounded, never
    # corpus-sized), not a SECOND full count pass over the training
    # corpus + crossJoin (r12, guide §2.4: the old n_total scan was a
    # whole extra job per training run for a number the per-class
    # aggregate already contains). n_docs/n divides the same bigints,
    # so logprior is bit-identical.
    n_total = F.sum("n_docs").over(Window.partitionBy())
    priors = docs.select(
        label_col, F.log(F.col("n_docs") / n_total).alias("logprior")
    )
    return model, priors


def naive_bayes_predict(
    docs: DataFrame,
    model: DataFrame,
    priors: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    id_col: str = "doc_id",
    round_score: int = 4,
) -> DataFrame:
    """Score documents against a trained model → (id, predicted, score).

    OOV tokens (absent from the training vocab) are ignored — the
    standard multinomial NB convention, and the one that keeps scoring
    an inner equi-join. The score is rounded before the argmax so an
    external SQL oracle summing in a different order lands on the same
    prediction (ties broken by label ascending).

    Tokens are compressed to per-doc term frequencies BEFORE the model
    join (``ll = Σ tf·logp``): the join input shrinks from total token
    occurrences to distinct (doc, token) pairs — on natural text a
    multi-x reduction of the rows multiplied by |classes|, which is
    what the broadcast join and the (doc, class) shuffle actually pay.
    """
    toks = _tokens(docs, text_col, id_col, None)
    tf = toks.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    scored = (
        tf.join(F.broadcast(model), "token")
        .groupBy(id_col, label_col)
        .agg(F.sum(F.col("tf") * F.col("logp")).alias("ll"))
        .join(F.broadcast(priors), label_col)
        .select(
            id_col,
            label_col,
            F.round(F.col("ll") + F.col("logprior"), round_score).alias("score"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col(label_col).asc())
    return (
        scored.withColumn("__r", F.row_number().over(w))
        .where(F.col("__r") == 1)
        .select(id_col, F.col(label_col).alias("predicted"), "score")
    )


def knn_classify(
    labeled: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Predict each query vector's label by majority vote of its k
    nearest labeled neighbours (cosine).

    Plan: broadcast the query set over the labeled corpus (corpus never
    shuffles for scoring), per-query window top-k, then a tiny
    (query, label) count argmax. Votes tie-break toward the nearer
    neighbour set implicitly via top-k membership, then label ascending.
    """
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).cast("array<double>").alias("__qv")
    ).withColumn("__qn", norm(F.col("__qv")))
    c = rebalance(
        labeled.select(
            F.col(id_col), F.col(label_col), F.col(vec_col).cast("array<double>").alias("__cv")
        )
    ).withColumn("__cn", norm(F.col("__cv")))  # once per row, not per query
    scored = c.crossJoin(F.broadcast(q)).select(
        F.col(query_id_col),
        F.col(id_col),
        F.col(label_col),
        F.round(
            dot(F.col("__qv"), F.col("__cv")) / (F.col("__qn") * F.col("__cn")), 4
        ).alias("cos"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cos").desc(), F.col(id_col).asc())
    neighbours = scored.withColumn("rnk", F.row_number().over(w)).where(F.col("rnk") <= k)
    votes = neighbours.groupBy(query_id_col, label_col).agg(
        F.count(F.lit(1)).alias("votes")
    )
    vw = Window.partitionBy(query_id_col).orderBy(
        F.col("votes").desc(), F.col(label_col).asc()
    )
    return (
        votes.withColumn("__r", F.row_number().over(vw))
        .where(F.col("__r") == 1)
        .select(query_id_col, F.col(label_col).alias("predicted"), "votes")
    )


def hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
    query_id_col: str = "query_id",
    query_label_col: str = "query_label",
) -> DataFrame:
    """Mine hard negatives: for each query, the k most cosine-similar
    corpus vectors with a DIFFERENT label — the pairs contrastive
    embedding training wants. Same broadcast-query / corpus-stationary
    plan as brute-force top-k; the label inequality is a map-side
    filter before the window."""
    q = queries.select(
        F.col(query_id_col),
        F.col(query_label_col),
        F.col(vec_col).cast("array<double>").alias("__qv"),
    ).withColumn("__qn", norm(F.col("__qv")))
    c = rebalance(
        corpus.select(
            F.col(id_col), F.col(label_col), F.col(vec_col).cast("array<double>").alias("__cv")
        )
    ).withColumn("__cn", norm(F.col("__cv")))  # once per row, not per query
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col(label_col) != F.col(query_label_col))
        .select(
            F.col(query_id_col),
            F.col(id_col).alias("neg_id"),
            F.col(label_col).alias("neg_label"),
            F.round(
                dot(F.col("__qv"), F.col("__cv")) / (F.col("__qn") * F.col("__cn")), 4
            ).alias("cos"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cos").desc(), F.col("neg_id").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rnk") <= k)
        .select(query_id_col, "neg_id", "neg_label", "cos", "rnk")
    )


def hashed_embeddings(
    df: DataFrame,
    dims: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Feature-hashed bag-of-words embeddings (the hashing trick,
    Weinberger et al. 2009): bucket = md5-prefix(token) mod dims,
    component = token count in that bucket, then L2-normalize.

    Turns raw text into a fixed-width ``array<double>`` column with ONE
    explode + ONE groupBy(doc) of ``dims`` conditional counts — fully
    codegen'd, no vocabulary state at all, so it needs no training pass
    and no broadcast. The output feeds every embedding operator in
    ``pipeline.similarity`` (ANN, SemDeDup, kNN) directly — the bridge
    from a text corpus to the vector pipeline at any scale.
    """
    toks = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("token")
    ).where(F.length("token") > 0)
    bucket = F.conv(F.substring(F.md5("token"), 1, 8), 16, 10).cast("bigint") % dims
    counts = toks.select(id_col, bucket.alias("b")).groupBy(id_col).agg(
        F.array(
            *[
                F.count_if(F.col("b") == i).cast("double")
                for i in range(dims)
            ]
        ).alias("raw")
    )
    nrm = F.sqrt(F.aggregate("raw", F.lit(0.0), lambda a, x: a + x * x))
    return counts.select(
        id_col,
        F.transform("raw", lambda x: x / nrm).alias("embedding"),
    )


def ndcg_at_k(
    ranked: DataFrame,
    labels: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    id_col: str = "vec_id",
    rank_col: str = "rnk",
    rel_col: str = "rel",
    ndigits: int = 4,
) -> DataFrame:
    """nDCG@k retrieval-quality eval: one row per query with
    ``(dcg, idcg, ndcg)`` using the standard exponential gain
    ``(2^rel - 1) / log2(pos + 1)``.

    Plan shape: DCG is a broadcast-or-shuffle join of the top-k ranking
    against the judged labels followed by a per-query sum; IDCG ranks
    each query's judged set by relevance in a window. Both shuffle only
    (query, doc, small-int) triples — at 100 TB the eval cost tracks
    the judgment set, never the corpus. All arithmetic is portable SQL
    (log2/pow), so a DuckDB oracle replays it exactly.

    Queries whose ranking hits no judged doc score dcg = 0 (the eval's
    point: an unjudged-only ranking is indistinguishable from a bad
    one under the available labels).
    """
    gain = lambda rel, pos: (F.pow(F.lit(2.0), rel) - 1) / F.log2(pos + 1)  # noqa: E731
    dcg = (
        ranked.where(F.col(rank_col) <= k)
        .join(labels, [query_col, id_col])
        .groupBy(query_col)
        .agg(F.sum(gain(F.col(rel_col), F.col(rank_col))).alias("dcg"))
    )
    w = Window.partitionBy(query_col).orderBy(F.desc(rel_col), F.col(id_col))
    idcg = (
        labels.withColumn("__ipos", F.row_number().over(w))
        .where(F.col("__ipos") <= k)
        .groupBy(query_col)
        .agg(F.sum(gain(F.col(rel_col), F.col("__ipos"))).alias("idcg"))
    )
    return (
        idcg.join(dcg, query_col, "left")
        .select(
            query_col,
            F.round(F.coalesce(F.col("dcg"), F.lit(0.0)), ndigits).alias("dcg"),
            F.round(F.col("idcg"), ndigits).alias("idcg"),
            F.round(
                F.coalesce(F.col("dcg"), F.lit(0.0)) / F.col("idcg"), ndigits
            ).alias("ndcg"),
        )
    )

def naive_bayes_calibration(
    docs: DataFrame,
    model: DataFrame,
    priors: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    id_col: str = "doc_id",
    bins: int = 10,
    round_score: int = 4,
) -> DataFrame:
    """Reliability-calibration bins for the NB gate: per test doc the
    top-1 softmax confidence, bucketed into ``bins`` equal-width bins
    → (bin_lo, n, avg_conf, accuracy). A well-calibrated filter has
    accuracy ≈ avg_conf per bin; a miscalibrated one over/under-trusts
    its own scores — the standard check before using classifier scores
    as curation sampling weights.

    ``docs`` must carry the ACTUAL label in ``label_col``. Same scoring
    join as :func:`naive_bayes_predict`; the softmax uses the max-shift
    trick with per-class relative mass rounded to 6 decimals before the
    sum, so the engine-vs-oracle float story is the registry's usual
    one (round before divide/compare; summands differ below rounding
    granularity). All windows are keyed by doc id — no global window,
    the per-doc class count is the model's |classes|.
    """
    toks = _tokens(docs, text_col, id_col, None)
    tf = toks.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    scored = (
        tf.join(F.broadcast(model), "token")
        .groupBy(id_col, label_col)
        .agg(F.sum(F.col("tf") * F.col("logp")).alias("ll"))
        .join(F.broadcast(priors), label_col)
        .select(
            id_col,
            label_col,
            F.round(F.col("ll") + F.col("logprior"), round_score).alias("score"),
        )
    )
    w = Window.partitionBy(id_col)
    rel = F.round(F.exp(F.col("score") - F.max("score").over(w)), 6)
    wr = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col(label_col).asc())
    top = (
        scored.withColumn("__rel", rel)
        .withColumn("__tot", F.sum("__rel").over(w))
        .withColumn("__r", F.row_number().over(wr))
        .where(F.col("__r") == 1)
        .select(
            id_col,
            F.col(label_col).alias("predicted"),
            F.round(F.col("__rel") / F.col("__tot"), 4).alias("confidence"),
        )
    )
    joined = docs.select(id_col, F.col(label_col).alias("actual")).join(top, id_col)
    bin_lo = F.least(F.floor(F.col("confidence") * bins), F.lit(bins - 1)) / bins
    return (
        joined.groupBy(bin_lo.alias("bin_lo"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("confidence"), 4).alias("avg_conf"),
            F.round(F.avg((F.col("predicted") == F.col("actual")).cast("double")), 4).alias("accuracy"),
        )
    )
