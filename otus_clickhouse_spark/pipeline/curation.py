"""End-to-end curation funnel (DCLM-style model-in-the-loop pipeline).

Extracted from the x47 registry query so the SAME code path serves the
driver-oracled query and the scale probes: exact dedup → quality filter
→ Naive-Bayes classifier gate (keep docs whose predicted source agrees
with the recorded one) → per-source token-budget selection.

Scale shape (100 TB): shuffles key on md5 digests, (class, token)
counts, and per-source windows — document bodies cross the wire only on
the first scan. The two multi-consumer intermediates (quality-filtered
docs, classifier-agreed docs) are eagerly localCheckpoint'd: one
materialization each, blocks freed on GC.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def curation_funnel(
    docs: DataFrame,
    token_budget: int = 5000,
    quality_floor: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Per-source counts at every funnel stage:
    (source, n_in, n_dedup, n_quality, n_agree, n_selected, tok_selected).
    """
    from otus_clickhouse_spark.pipeline.classify import (
        naive_bayes_predict,
        naive_bayes_train,
    )
    from otus_clickhouse_spark.pipeline.text import quality_score, token_count

    rep = (
        docs.groupBy(F.md5(text_col))
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    dedup = docs.join(rep, id_col, "left_semi")
    staged = dedup.select(
        id_col,
        source_col,
        text_col,
        quality_score(F.col(text_col)).alias("quality"),
        token_count(F.col(text_col)).cast("bigint").alias("n_tok"),
    )
    qual = staged.where(F.col("quality") >= quality_floor).localCheckpoint()
    train = qual.where(F.col(id_col) % 5 != 0)
    model, priors = naive_bayes_train(
        train, text_col=text_col, label_col=source_col, id_col=id_col
    )
    pred = naive_bayes_predict(
        qual, model, priors, text_col=text_col, label_col=source_col, id_col=id_col
    )
    agree = (
        qual.join(pred, id_col)
        .where(F.col("predicted") == F.col(source_col))
        .localCheckpoint()
    )
    w = (
        Window.partitionBy(source_col)
        .orderBy(F.col("quality").desc(), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sel = agree.withColumn("cum", F.sum("n_tok").over(w)).where(
        F.col("cum") <= token_budget
    )

    def per_source(df, name, extra=None):
        aggs = [F.count(F.lit(1)).cast("bigint").alias(name)]
        if extra is not None:
            aggs.append(extra)
        return df.groupBy(source_col).agg(*aggs)

    out = (
        per_source(docs, "n_in")
        .join(per_source(dedup, "n_dedup"), source_col, "left")
        .join(per_source(qual, "n_quality"), source_col, "left")
        .join(per_source(agree, "n_agree"), source_col, "left")
        .join(
            per_source(
                sel, "n_selected", F.sum("n_tok").cast("bigint").alias("tok_selected")
            ),
            source_col,
            "left",
        )
    )
    zero = F.lit(0).cast("bigint")
    return out.select(
        source_col,
        "n_in",
        *[
            F.coalesce(F.col(c), zero).alias(c)
            for c in ["n_dedup", "n_quality", "n_agree", "n_selected", "tok_selected"]
        ],
    )


def domain_cap(
    docs: DataFrame,
    cap: int,
    domain_col: str = "source",
    quality_col: str = "quality",
    id_col: str = "doc_id",
    salts: int = 16,
) -> DataFrame:
    """Per-domain document cap: keep at most ``cap`` docs per domain,
    highest ``quality_col`` first (id ascending breaks ties) — the
    web-corpus guard against a single host dominating the training mix
    (the step CommonCrawl-derived pipelines run right after URL dedup).

    Skew-proof two-phase top-N: a naive window over ``domain_col``
    sends EVERY doc of a mega-domain to one task. Phase 1 windows over
    ``(domain, id % salts)`` and keeps each salt's local top-``cap`` —
    per-task input is ~1/salts of the worst domain; phase 2 runs the
    exact window over the ≤ salts·cap survivors per domain. The union
    of salted local top-caps provably contains the global top-cap, so
    the result is exactly the single-window answer."""
    salted = Window.partitionBy(
        domain_col, F.pmod(F.col(id_col), F.lit(salts))
    ).orderBy(F.desc(quality_col), F.asc(id_col))
    survivors = (
        docs.withColumn("__rn", F.row_number().over(salted))
        .where(F.col("__rn") <= cap)
        .drop("__rn")
    )
    exact = Window.partitionBy(domain_col).orderBy(F.desc(quality_col), F.asc(id_col))
    return (
        survivors.withColumn("__rn", F.row_number().over(exact))
        .where(F.col("__rn") <= cap)
        .drop("__rn")
    )


def token_drift(
    old: DataFrame,
    new: DataFrame,
    text_col: str = "text",
    top_n: int = 10,
) -> DataFrame:
    """Unigram-distribution drift between two corpus snapshots — the
    monitoring check a training-data pipeline runs when a new crawl /
    dump lands: Jensen-Shannon divergence over the merged vocabulary
    plus the top token-level contributors.

    Scale shape: each snapshot reduces to a (token, count) table in one
    map-side-combined pass — every later join/aggregate is VOCABULARY-
    bounded, never corpus-bounded; document bodies cross the wire only
    in the first scan. Per-token JS contributions are rounded before
    the final sum so the scalar is reproducible across engines and
    summation orders."""
    def counts(df, alias):
        return (
            df.select(F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("tok"))
            .where(F.length("tok") > 0)
            .groupBy("tok")
            .agg(F.count(F.lit(1)).alias(alias))
        )

    o, n = counts(old, "n_old"), counts(new, "n_new")
    tot_o = o.agg(F.sum("n_old")).collect()[0][0] or 1
    tot_n = n.agg(F.sum("n_new")).collect()[0][0] or 1
    merged = (
        o.join(n, "tok", "full")
        .select(
            "tok",
            F.coalesce("n_old", F.lit(0)).alias("n_old"),
            F.coalesce("n_new", F.lit(0)).alias("n_new"),
        )
        .withColumn("p", F.col("n_old") / F.lit(float(tot_o)))
        .withColumn("q", F.col("n_new") / F.lit(float(tot_n)))
        .withColumn("m", (F.col("p") + F.col("q")) / 2)
        .withColumn(
            "js_part",
            F.round(
                F.when(F.col("p") > 0, 0.5 * F.col("p") * F.log2(F.col("p") / F.col("m"))).otherwise(0.0)
                + F.when(F.col("q") > 0, 0.5 * F.col("q") * F.log2(F.col("q") / F.col("m"))).otherwise(0.0),
                12,
            ),
        )
        .localCheckpoint(eager=True)  # vocabulary-sized; reused twice below
    )
    js = merged.agg(F.round(F.sum("js_part"), 6).alias("js_divergence"))
    top = (
        merged.select(
            "tok",
            F.round("p", 6).alias("p_old"),
            F.round("q", 6).alias("p_new"),
            F.round(F.abs(F.col("p") - F.col("q")), 6).alias("delta"),
        )
        # orderBy+limit plans as TakeOrderedAndProject: per-partition
        # top-N over the vocabulary table, tiny driver merge
        .orderBy(F.desc("delta"), F.asc("tok"))
        .limit(top_n)
    )
    return top.crossJoin(js)
