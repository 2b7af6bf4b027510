"""Benchmark decontamination: flag/remove training documents that share
word n-grams with an evaluation set.

Standard large-scale pre-training hygiene (the published recipe in GPT-3
/ Llama data work): any training doc containing an n-gram that also
appears in a benchmark/eval document is "contaminated" and must be
dropped so downstream evals stay honest. This extends the repo's
shingle machinery (pipeline.dedup.shingles — the same word-n-gram
definition the MinHash path uses, so one tokenization convention serves
both dedup and decontamination).

Scale notes (100 TB):
- The eval set is small by construction (benchmarks are KBs-MBs), so
  its distinct n-gram set is broadcast — the corpus-side shingle stream
  is filtered map-side by a BroadcastHashJoin(LeftSemi); the corpus
  never shuffles its text.
- The only shuffle is the final distinct over contaminated doc ids
  (16-byte-ish keys, bounded by the hit count, not the corpus size).
- Flagging (`contamination_flags`) joins those ids back broadcast-side
  too when the hit set is small; Spark AQE picks that automatically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from otus_clickhouse_spark.pipeline.dedup import shingles


def eval_ngrams(
    eval_df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """Distinct word n-grams of the eval set — the (small) blocklist."""
    return shingles(eval_df, text_col, id_col, n).select("shingle").distinct()


def contaminated_ids(
    train_df: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Ids of training docs sharing ≥1 n-gram with the eval set.

    Plan: corpus shingles ⋉ broadcast(eval n-grams) → distinct ids.
    The semi-join runs map-side over the scan; no corpus shuffle.
    """
    ev = eval_ngrams(eval_df, text_col, id_col, n)
    tr = shingles(train_df, text_col, id_col, n)
    return tr.join(F.broadcast(ev), "shingle", "left_semi").select(id_col).distinct()


def contamination_flags(
    train_df: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """train_df + boolean ``contaminated`` column (audit mode)."""
    hits = contaminated_ids(train_df, eval_df, text_col, id_col, n).withColumn(
        "contaminated", F.lit(True)
    )
    return train_df.join(hits, id_col, "left").withColumn(
        "contaminated", F.coalesce("contaminated", F.lit(False))
    )


def decontaminate(
    train_df: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """train_df minus contaminated docs (drop mode): left-anti join
    against the contaminated-id set."""
    hits = contaminated_ids(train_df, eval_df, text_col, id_col, n)
    return train_df.join(hits, id_col, "left_anti")


def semantic_contaminated_ids(
    corpus: DataFrame,
    eval_set: DataFrame,
    threshold: float = 0.85,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_cos: int = 4,
) -> DataFrame:
    """Embedding-based decontamination: flag corpus docs whose vector
    sits within ``threshold`` cosine of ANY eval vector — the semantic
    complement of the n-gram path (paraphrased benchmark leakage that
    shares no exact n-gram).

    Plan shape mirrors the n-gram path's broadcast discipline: the eval
    set is benchmark-sized, so it broadcasts; the corpus is scanned
    once, scored JVM-side (zip_with dot product), and only matching
    ids reach the final distinct — shuffle bounded by the hit count.
    At stricter scale, swap the broadcast nested-loop for the
    LSH-bucketed join (pipeline.similarity.lsh_topk's banding) — same
    contract, pruned candidate set.
    """
    from otus_clickhouse_spark.pipeline.similarity import dot, norm

    c = corpus.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("__cv")
    ).withColumn("__cn", norm(F.col("__cv")))  # once per row, not per eval vec
    e = eval_set.select(
        F.col(id_col).alias("__eval_id"), F.col(vec_col).cast("array<double>").alias("__ev")
    ).withColumn("__en", norm(F.col("__ev")))
    return (
        c.crossJoin(F.broadcast(e))
        .where(
            F.round(
                dot(F.col("__cv"), F.col("__ev")) / (F.col("__cn") * F.col("__en")),
                round_cos,
            )
            >= threshold
        )
        .select(id_col)
        .distinct()
    )


def eval_overlap_report(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    eval_mod: int = 11,
    max_gram_df: int | None = 1000,
) -> DataFrame:
    """Per-EVAL-ITEM contamination report — the integrity sheet an eval
    owner reads, where :func:`contaminated_ids` (x19) answers the
    training-side question ("which train docs must go"), this answers
    the eval side: for each eval doc, what fraction of its n-grams
    already exists in the training corpus (coverage) and which single
    training doc overlaps it most (the doc a leakage audit opens
    first). Eval membership = ``id % eval_mod == 0`` here (the x19
    split); production passes a real eval frame.

    Scale shape: shingle sets are built once and reused by both sides;
    all joins key on 8-byte xxhash64 digests (never the gram strings —
    same convention/collision odds as jaccard_verify); the coverage
    join is against the DISTINCT train-gram relation; the top-1 window
    is keyed per eval item. Output is eval-set-sized.

    ``max_gram_df`` is the skew guard the per-pair ATTRIBUTION join
    needs (same degree-cap idea as substring/winnowing dedup's
    ``max_bucket``): a gram present in more than that many training
    docs fans every eval doc containing it out to all of them — the
    round-8 scale probe measured the uncapped join going SUB-linear
    (0.7× rows/s at 10× docs) on a hot-gram corpus. Ubiquitous grams
    carry no leakage signal (standard stop-gram practice in
    decontamination), so they are dropped from the attribution join
    only — they still count toward ``coverage``, which needs no pair
    expansion. ``None`` disables the cap."""
    sh = shingles(df, text_col, id_col, n).localCheckpoint()
    is_eval = F.col(id_col) % eval_mod == 0
    ev = sh.where(is_eval).select(
        F.col(id_col).alias("eval_id"), F.xxhash64("shingle").alias("__sh")
    )
    tr = sh.where(~is_eval).select(
        F.col(id_col).alias("train_id"), F.xxhash64("shingle").alias("__sh")
    )
    sizes = ev.groupBy("eval_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_shingles")
    )
    cov = (
        ev.join(tr.select("__sh").distinct(), "__sh")
        .groupBy("eval_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_covered"))
    )
    tr_attr = tr
    if max_gram_df is not None:
        hot = (
            tr.groupBy("__sh")
            .agg(F.count(F.lit(1)).alias("__df"))  # tr is distinct per doc
            .where(F.col("__df") > max_gram_df)
            .select("__sh")
        )
        tr_attr = tr.join(hot, "__sh", "left_anti")
    pairs = (
        ev.join(tr_attr, "__sh")
        .groupBy("eval_id", "train_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("shared"))
    )
    w = Window.partitionBy("eval_id").orderBy(F.desc("shared"), F.asc("train_id"))
    top = (
        pairs.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(
            "eval_id",
            F.col("train_id").alias("top_train_doc"),
            F.col("shared").alias("top_shared"),
        )
    )
    return (
        sizes.join(cov, "eval_id", "left")
        .join(top, "eval_id", "left")
        .select(
            "eval_id",
            "n_shingles",
            F.coalesce("n_covered", F.lit(0)).cast("bigint").alias("n_covered"),
            F.round(
                F.coalesce("n_covered", F.lit(0)) * F.lit(1.0) / F.col("n_shingles"), 4
            ).alias("coverage"),
            F.coalesce("top_train_doc", F.lit(-1)).cast("bigint").alias("top_train_doc"),
            F.coalesce("top_shared", F.lit(0)).cast("bigint").alias("top_shared"),
        )
        .orderBy("eval_id")
    )
