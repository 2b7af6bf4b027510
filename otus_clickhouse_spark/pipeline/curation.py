"""End-to-end curation funnel (DCLM-style model-in-the-loop pipeline).

Extracted from the x47 registry query so the SAME code path serves the
driver-oracled query and the scale probes: exact dedup → quality filter
→ Naive-Bayes classifier gate (keep docs whose predicted source agrees
with the recorded one) → per-source token-budget selection.

Scale shape (100 TB): shuffles key on md5 digests, (class, token)
counts, and per-(source, quality) histograms — document bodies cross
the wire only on the first scan, and no window ever sees corpus-sized
input (the token-budget cut reduces to histogram cumsums plus a
tie-bounded boundary-bucket window). The two multi-consumer
intermediates (quality-filtered docs, classifier-agreed docs) are
eagerly localCheckpoint'd: one materialization each, blocks freed on GC.
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
    # the downstream consumers (per-source count + the token-budget
    # cut) never read text — drop it (and the NB score) BEFORE the
    # materialization so the checkpoint stores 4 narrow columns, not
    # document bodies (guide §2.3: project before you materialize)
    agree = (
        qual.select(id_col, source_col, "quality", "n_tok")
        .join(pred.select(id_col, "predicted"), id_col)
        .where(F.col("predicted") == F.col(source_col))
        .drop("predicted")
        .localCheckpoint()
    )
    sel_stats = budget_select_stats(
        agree, token_budget, source_col=source_col, id_col=id_col
    )

    # Final assembly (r12, guide §2.4): the old form scanned `docs`
    # twice (n_in, plus the md5 groupBy + semi-join recompute behind
    # n_dedup) and stitched five per-source aggregates with four
    # broadcast left-joins — each join its own exchange + broadcast
    # job, all for ~|sources| rows. Instead:
    #  - ONE docs pass groups by (digest, source); n_in sums the
    #    per-group counts, n_dedup counts each digest's representative
    #    (min_by(source, min_id) — the min-id doc's source, exactly the
    #    doc the semi-join kept). The two consumers share the digest
    #    exchange (ReuseExchange), so the funnel-stage counts cost one
    #    scan and no join.
    #  - the five stat relations union into (source, k, v) and pivot
    #    back to columns with ONE ~|sources|-row groupBy — no
    #    broadcast-join chain.
    g = docs.groupBy(F.md5(text_col).alias("__dg"), source_col).agg(
        F.count(F.lit(1)).alias("__c"), F.min(id_col).alias("__mid")
    )
    big = "bigint"

    def kv(df, k, vcol):
        return df.select(
            F.col(source_col), F.lit(k).alias("__k"), F.col(vcol).cast(big).alias("__v")
        )

    s0 = kv(g.groupBy(source_col).agg(F.sum("__c").alias("v")), "n_in", "v")
    s1 = kv(
        g.groupBy("__dg")
        .agg(F.min_by(source_col, "__mid").alias(source_col))
        .groupBy(source_col)
        .agg(F.count(F.lit(1)).alias("v")),
        "n_dedup",
        "v",
    )
    s2 = kv(qual.groupBy(source_col).agg(F.count(F.lit(1)).alias("v")), "n_quality", "v")
    s3 = kv(agree.groupBy(source_col).agg(F.count(F.lit(1)).alias("v")), "n_agree", "v")
    s4 = sel_stats.select(
        F.col(source_col),
        F.explode(
            F.create_map(
                F.lit("n_selected"), F.col("n_selected").cast(big),
                F.lit("tok_selected"), F.col("tok_selected").cast(big),
            )
        ).alias("__k", "__v"),
    )
    cols = ["n_in", "n_dedup", "n_quality", "n_agree", "n_selected", "tok_selected"]
    wide = (
        s0.union(s1)
        .union(s2)
        .union(s3)
        .union(s4)
        .groupBy(source_col)
        .pivot("__k", cols)
        .agg(F.first("__v"))
    )
    zero = F.lit(0).cast(big)
    return wide.select(
        source_col,
        F.col("n_in").cast(big).alias("n_in"),
        *[F.coalesce(F.col(c), zero).cast(big).alias(c) for c in cols[1:]],
    )


def budget_select_stats(
    df: DataFrame,
    token_budget: int,
    source_col: str = "source",
    id_col: str = "doc_id",
    quality_col: str = "quality",
    tok_col: str = "n_tok",
) -> DataFrame:
    """Per-source (n_selected, tok_selected) for the token-budget cut:
    rows kept while the running sum of ``tok_col`` over
    (quality DESC, id ASC) stays <= ``token_budget``. ``tok_col`` must
    be non-negative (token counts) and ``id_col`` unique.

    Scale shape (r8 verdict ask #1): the naive form — a cumulative-sum
    window partitioned by the ~20-ary source key over the
    corpus-proportional input — single-tasks a multi-TB sort at 100 TB.
    Since quality rounds to 4 decimals upstream, reduce to a
    per-(source, quality) histogram (≤ ~10k rows/source), locate the
    ONE bucket per source where the running token total crosses the
    budget from bucket-level cumulative sums, and resolve only that
    bucket's rows with a window over the tie-bounded bucket (x25
    two-phase trick). tok >= 0 makes the row-level cumsum
    nondecreasing, so the kept set is exactly (full buckets with
    tcum <= budget) + (the boundary bucket's id-ordered prefix fitting
    the remaining budget)."""
    hist = df.groupBy(source_col, quality_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("__c"),
        F.sum(tok_col).cast("bigint").alias("__st"),
    )
    wh = Window.partitionBy(source_col).orderBy(F.desc(quality_col))
    cum = hist.withColumn("__tcum", F.sum("__st").over(wh))
    budget = F.lit(int(token_budget))
    full_stats = (
        cum.where(F.col("__tcum") <= budget)
        .groupBy(source_col)
        .agg(
            F.sum("__c").cast("bigint").alias("__full_n"),
            F.sum("__st").cast("bigint").alias("__full_tok"),
        )
    )
    boundary = cum.where(
        ((F.col("__tcum") - F.col("__st")) <= budget) & (F.col("__tcum") > budget)
    ).select(
        source_col,
        F.col(quality_col).alias("__bq"),
        (budget - (F.col("__tcum") - F.col("__st"))).alias("__rem"),
    )
    wb = (
        Window.partitionBy(source_col)
        .orderBy(F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    part_stats = (
        df.join(F.broadcast(boundary), source_col)
        .where(F.col(quality_col) == F.col("__bq"))
        .withColumn("__run", F.sum(tok_col).over(wb))
        .where(F.col("__run") <= F.col("__rem"))
        .groupBy(source_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("__part_n"),
            F.sum(tok_col).cast("bigint").alias("__part_tok"),
        )
    )
    zero = F.lit(0).cast("bigint")
    return full_stats.join(part_stats, source_col, "full").select(
        source_col,
        (F.coalesce("__full_n", zero) + F.coalesce("__part_n", zero))
        .cast("bigint")
        .alias("n_selected"),
        (F.coalesce("__full_tok", zero) + F.coalesce("__part_tok", zero))
        .cast("bigint")
        .alias("tok_selected"),
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


def _hist_median(vals: DataFrame, key_col: str, val_col: str) -> DataFrame:
    """Exact per-key median WITHOUT per-group value buffering: Spark's
    exact ``percentile`` aggregate holds every group value in executor
    memory (an OOM at 100 TB group sizes), so the median here reduces
    the corpus to a (key, value)-HISTOGRAM first — state bounded by
    DISTINCT values per key, not rows — then walks cumulative counts
    over the histogram (a keyed window over histogram-sized input) and
    interpolates the two middle positions, replaying
    ``quantile_cont(0.5)`` exactly. Returns (key_col, median)."""
    hist = vals.groupBy(key_col, val_col).agg(F.count(F.lit(1)).alias("__c"))
    w = Window.partitionBy(key_col).orderBy(val_col)
    cum = hist.withColumn("__cum", F.sum("__c").over(w))
    tot = hist.groupBy(key_col).agg(F.sum("__c").alias("__n"))
    j = cum.join(F.broadcast(tot), key_col)  # tot: one row per key
    lo = F.floor((F.col("__n") + F.lit(1)) / F.lit(2.0))
    hi = F.ceil((F.col("__n") + F.lit(1)) / F.lit(2.0))
    # value at 1-based position p = min value whose cumulative count >= p
    return (
        j.groupBy(key_col)
        .agg(
            F.min(F.when(F.col("__cum") >= lo, F.col(val_col))).alias("__vlo"),
            F.min(F.when(F.col("__cum") >= hi, F.col(val_col))).alias("__vhi"),
        )
        .select(
            F.col(key_col),
            (F.col("__vlo") + (F.col("__vhi") - F.col("__vlo")) / F.lit(2.0)).alias(
                "median"
            ),
        )
    )


def robust_length_outliers(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
    z: float = 3.0,
    round_at: int = 4,
) -> DataFrame:
    """Robust per-source outlier gate on document length — the
    median/MAD filter (Hampel identifier) a curation pipeline uses
    where mean/stddev would be dragged by the very outliers it hunts:
    flag docs with |len − median| > z · 1.4826 · MAD (1.4826 makes MAD
    a consistent σ estimator under normality).

    Scale shape: both medians run through :func:`_hist_median` — the
    corpus collapses to value histograms (distinct-length-bounded),
    the per-source median/MAD models are #groups rows broadcast back,
    and the final pass is one map-side flag + one grouped reduce.
    Returns per source: (source, n_docs, med_len, mad_len, n_outliers,
    outlier_id_sum) — the id-sum pins WHICH docs were flagged without
    emitting a corpus-sized result."""
    lens = docs.select(
        F.col(id_col),
        F.col(group_col),
        F.length(F.col(text_col)).cast("double").alias("__len"),
    )
    med = _hist_median(lens, group_col, "__len").withColumnRenamed("median", "__med")
    with_med = lens.join(F.broadcast(med), group_col)
    devs = with_med.select(
        F.col(group_col), F.abs(F.col("__len") - F.col("__med")).alias("__dev")
    )
    mad = _hist_median(devs, group_col, "__dev").withColumnRenamed("median", "__mad")
    flagged = with_med.join(F.broadcast(mad), group_col).withColumn(
        "__is_out",
        F.abs(F.col("__len") - F.col("__med"))
        > F.lit(z) * F.lit(1.4826) * F.col("__mad"),
    )
    return (
        flagged.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.round(F.first("__med"), round_at).alias("med_len"),
            F.round(F.first("__mad"), round_at).alias("mad_len"),
            F.sum(F.col("__is_out").cast("int")).cast("bigint").alias("n_outliers"),
            F.coalesce(
                F.sum(F.when(F.col("__is_out"), F.col(id_col))), F.lit(0)
            )
            .cast("bigint")
            .alias("outlier_id_sum"),
        )
        .orderBy(group_col)
    )


def quantile_quality_gate(
    df: DataFrame,
    keep_frac: float = 0.25,
    quality_col: str = "quality",
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Relative quality gate: keep the top ``keep_frac`` of each source
    by quality — x61's absolute doc-count cap answers "no more than N
    per host"; this answers "only the best quarter of each source",
    which is how DCLM/FineWeb-style pipelines apply a model-scored
    filter without letting a big source's mediocre middle crowd out a
    small source's best. Semantics are exactly a percent_rank cut over
    (quality DESC, id ASC): ``id_col`` must be unique, so rank ==
    row_number and the kept set is the first K rows of each source
    where K replays Spark's double ``(rank-1)/(n-1) <= keep_frac``
    boundary.

    Scale shape (r8 verdict ask #1): the naive form — one percent_rank
    window partitioned by a ~20-ary ``group_col`` — funnels EVERY row
    of a source into one sort task (a multi-TB single-task sort at
    100 TB). Instead the corpus reduces to a per-(source, quality)
    HISTOGRAM (quality values round to 4 decimals upstream, so ≤ ~10k
    rows per source); the cut position K comes from per-source totals;
    whole kept buckets are summed from histogram rows; and the ONE
    boundary bucket per source is tie-broken with a window whose input
    is only that bucket's rows (bounded by ties at a single quality
    value — the x25 two-phase trick). No corpus-sized window remains."""
    hist = df.groupBy(group_col, quality_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("__c"),
        F.sum(id_col).cast("bigint").alias("__ids"),
    )
    tot = hist.groupBy(group_col).agg(F.sum("__c").alias("__n"))
    # K = #rows with percent_rank <= keep_frac, replaying the DOUBLE
    # division (rank-1)/(n-1): candidate m = floor(kf*(n-1)) can be off
    # by one ulp either way, so probe m+1 / m / m-1 with the same
    # double comparison the window operator would evaluate.
    d = (F.col("__n") - F.lit(1)).cast("double")
    j = F.floor(F.lit(float(keep_frac)) * d)
    kf = F.lit(float(keep_frac))
    m = (
        F.when(F.col("__n") == 1, F.lit(0))
        .when((j + F.lit(1)).cast("double") / d <= kf, j + F.lit(1))
        .when(j.cast("double") / d <= kf, j)
        .otherwise(j - F.lit(1))
    )
    cuts = tot.select(
        group_col,
        "__n",
        F.greatest(F.least(m + F.lit(1), F.col("__n")), F.lit(0)).alias("__k"),
    )
    # cumulative counts over the HISTOGRAM (quality unique per bucket)
    wh = Window.partitionBy(group_col).orderBy(F.desc(quality_col))
    cum = hist.withColumn("__cum", F.sum("__c").over(wh))
    j2 = cum.join(F.broadcast(cuts), group_col)
    kept_b = F.greatest(
        F.least(F.col("__k") - (F.col("__cum") - F.col("__c")), F.col("__c")),
        F.lit(0),
    )
    stats = j2.groupBy(group_col).agg(
        F.first("__n").cast("bigint").alias("n_docs"),
        F.first(F.least(F.col("__k"), F.col("__n"))).cast("bigint").alias("n_kept"),
        F.round(F.min(F.when(kept_b > 0, F.col(quality_col))), 4).alias(
            "min_kept_quality"
        ),
        F.coalesce(F.sum(F.when(kept_b == F.col("__c"), F.col("__ids"))), F.lit(0))
        .cast("bigint")
        .alias("__full_ids"),
    )
    # the (at most one per source) partially-kept boundary bucket:
    # smallest `__take` ids among the rows tied at that quality value
    boundary = j2.where((kept_b > 0) & (kept_b < F.col("__c"))).select(
        group_col, F.col(quality_col).alias("__bq"), kept_b.alias("__take")
    )
    wb = Window.partitionBy(group_col).orderBy(F.asc(id_col))
    part = (
        df.join(F.broadcast(boundary), group_col)
        .where(F.col(quality_col) == F.col("__bq"))
        .withColumn("__rn", F.row_number().over(wb))
        .where(F.col("__rn") <= F.col("__take"))
        .groupBy(group_col)
        .agg(F.sum(id_col).cast("bigint").alias("__part_ids"))
    )
    return (
        stats.join(part, group_col, "left")
        .select(
            group_col,
            "n_docs",
            "n_kept",
            "min_kept_quality",
            (F.col("__full_ids") + F.coalesce(F.col("__part_ids"), F.lit(0)))
            .cast("bigint")
            .alias("kept_id_sum"),
        )
        .orderBy(group_col)
    )


def length_quantile_summary(
    docs: DataFrame,
    ps: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9, 0.99),
    val_col: str = "n_chars",
    group_col: str = "source",
) -> DataFrame:
    """Exact per-source quantile summary of a value column (the length
    profile sheet a curation run reads before setting chunking and
    outlier thresholds). Quantiles are DISCRETE — the value at 1-based
    position ``ceil(p·n)`` — so both engines agree bit-for-bit with no
    interpolation.

    Scale shape: same histogram discipline as :func:`_hist_median` —
    the corpus reduces to a (source, value) histogram (state bounded by
    DISTINCT values per source, never rows; Spark's exact percentile
    aggregate would buffer every group value), one cumulative walk over
    histogram rows, and ALL requested quantiles come out of a single
    grouped reduction over that walk. Output is #sources rows."""
    hist = docs.groupBy(group_col, val_col).agg(F.count(F.lit(1)).alias("__c"))
    w = Window.partitionBy(group_col).orderBy(val_col)
    cum = hist.withColumn("__cum", F.sum("__c").over(w))
    tot = hist.groupBy(group_col).agg(F.sum("__c").alias("__n"))
    j = cum.join(F.broadcast(tot), group_col)
    aggs = [F.first("__n").cast("bigint").alias("n_docs")]
    for p in ps:
        pos = F.ceil(F.lit(float(p)) * F.col("__n"))
        aggs.append(
            F.min(F.when(F.col("__cum") >= pos, F.col(val_col)))
            .cast("bigint")
            .alias(f"p{int(round(p * 100))}")
        )
    return j.groupBy(group_col).agg(*aggs).orderBy(group_col)


def quality_decile_profile(
    docs: DataFrame,
    text_col: str = "text",
    chars_col: str = "n_chars",
    n_buckets: int = 10,
) -> DataFrame:
    """Global quality-decile profile: split the corpus into quality
    deciles and report per-decile doc counts and mean length — the
    calibration sheet for a quality score ("does the top decile look
    different from the bottom?", the check run before trusting x75's
    gate). Decile boundaries are DISC quantile values (value at
    position ``ceil(d·n/10)``); a whole 4dp-quality bucket maps to the
    first decile whose threshold covers it, so assignment is
    deterministic and histogram-level (no per-row rank).

    Scale shape: the corpus reduces to a global (quality, count,
    sum_chars) histogram (≤ ~10k rows — quality rounds to 4 decimals),
    the decile thresholds come from ONE cumulative walk over that
    histogram (an unpartitioned window over bounded input), and the
    per-decile reduce is over histogram rows. Nothing corpus-sized
    shuffles after the first aggregation."""
    from otus_clickhouse_spark.pipeline.text import quality_score

    scored = docs.select(
        quality_score(F.col(text_col)).alias("__q"), F.col(chars_col)
    )
    hist = scored.groupBy("__q").agg(
        F.count(F.lit(1)).alias("__c"), F.sum(chars_col).alias("__sc")
    )
    w = Window.orderBy("__q")  # histogram-sized input (bounded allowlist)
    cum = hist.withColumn("__cum", F.sum("__c").over(w))
    tot = hist.agg(F.sum("__c").alias("__n"))
    jc = cum.crossJoin(F.broadcast(tot))
    th = jc.agg(
        *[
            F.min(
                F.when(
                    F.col("__cum")
                    >= F.ceil(F.col("__n") * F.lit(d / float(n_buckets))),
                    F.col("__q"),
                )
            ).alias(f"__t{d}")
            for d in range(1, n_buckets + 1)
        ]
    )
    dec = None
    for d in range(1, n_buckets):
        cond = F.col("__q") <= F.col(f"__t{d}")
        dec = F.when(cond, F.lit(d)) if dec is None else dec.when(cond, F.lit(d))
    dec = dec.otherwise(F.lit(n_buckets))
    return (
        hist.crossJoin(F.broadcast(th))
        .select(dec.cast("bigint").alias("decile"), "__q", "__c", "__sc")
        .groupBy("decile")
        .agg(
            F.sum("__c").cast("bigint").alias("n_docs"),
            F.round(F.sum("__sc") / F.sum("__c"), 2).alias("avg_chars"),
            F.round(F.min("__q"), 4).alias("min_q"),
            F.round(F.max("__q"), 4).alias("max_q"),
        )
        .orderBy("decile")
    )


def length_quality_corr(
    docs: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    round_at: int = 4,
) -> DataFrame:
    """Per-source Pearson correlation between token count and quality
    score — the sanity check on a quality heuristic ("is the score just
    proxying length?"): a source where corr ≈ 1 means the gate of x75
    is a length filter in disguise there.

    The correlation is computed from the six sufficient statistics
    (n, Σx, Σy, Σxy, Σx², Σy²) in ONE map-side-combined aggregation —
    deliberately NOT the built-in ``corr`` aggregate, whose streaming
    co-moment update order differs between engines; the closed form
    over exact integer sums (x is an int token count) and rounded
    quality values replays bit-stably in the oracle. Zero-variance
    groups report 0."""
    from otus_clickhouse_spark.pipeline.text import quality_score, token_count

    base = docs.select(
        F.col(group_col),
        token_count(F.col(text_col)).cast("double").alias("__x"),
        quality_score(F.col(text_col)).alias("__y"),
    )
    s = base.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
        F.sum("__x").alias("__sx"),
        F.sum("__y").alias("__sy"),
        F.sum(F.col("__x") * F.col("__y")).alias("__sxy"),
        F.sum(F.col("__x") * F.col("__x")).alias("__sxx"),
        F.sum(F.col("__y") * F.col("__y")).alias("__syy"),
    )
    varx = s["__n"] * s["__sxx"] - s["__sx"] * s["__sx"]
    vary = s["__n"] * s["__syy"] - s["__sy"] * s["__sy"]
    num = s["__n"] * s["__sxy"] - s["__sx"] * s["__sy"]
    corr = F.when((varx <= 0) | (vary <= 0), F.lit(0.0)).otherwise(
        F.round(num / (F.sqrt(varx) * F.sqrt(vary)), round_at)
    )
    return s.select(
        F.col(group_col),
        F.col("__n").cast("bigint").alias("n_docs"),
        F.round(s["__sx"] / s["__n"], round_at).alias("mean_tokens"),
        F.round(s["__sy"] / s["__n"], round_at).alias("mean_quality"),
        corr.alias("corr_len_quality"),
    ).orderBy(group_col)


def gate_disagreement(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
    quality_keep_at: float = 0.5,
) -> DataFrame:
    """Quality-signal governance sheet: confusion matrix, per source,
    between the two independent keep/drop signals the funnel uses —
    the heuristic quality score (length/word-length/alpha composite,
    keep at >= ``quality_keep_at``) and the bigram-LM perplexity gate
    (keep when avg NLL <= the corpus median). Two gates that agree add
    nothing; systematic one-sided disagreement in a source is the
    signal to re-weigh or re-train a gate BEFORE it silently drops a
    domain. Docs with < 2 tokens have no LM score and are out of scope.

    Per source: ``n_docs``, ``n_both_keep``, ``n_quality_only``,
    ``n_ppl_only``, ``n_both_drop``, ``agree_pct`` (integer counts; one
    division rounded 4dp).

    Scale shape: the LM score is :func:`~.text.bigram_nll` (vocabulary-
    bounded count tables broadcast onto the map-side pair stream); the
    NLL median reduces to a value histogram (avg_nll is 4dp-rounded
    upstream, so the histogram is bounded by distinct 4dp values, never
    rows) and broadcasts back as ONE row; the confusion is a single
    grouped reduce of map-side flags.
    """
    from otus_clickhouse_spark.pipeline.text import bigram_nll, quality_score

    nll = bigram_nll(docs, text_col, id_col)
    med = _hist_median(
        nll.select(F.lit(1).alias("__k"), "avg_nll"), "__k", "avg_nll"
    ).select(F.col("median").alias("__med"))
    scored = (
        docs.select(
            F.col(id_col),
            F.col(group_col),
            quality_score(F.col(text_col)).alias("__q"),
        )
        .join(nll.select(id_col, "avg_nll"), id_col)
        .crossJoin(F.broadcast(med))
    )
    keep_q = (F.col("__q") >= quality_keep_at).cast("int")
    keep_p = (F.col("avg_nll") <= F.col("__med")).cast("int")
    flags = scored.select(
        group_col, keep_q.alias("__kq"), keep_p.alias("__kp")
    )
    n = F.count(F.lit(1))
    both = F.sum((F.col("__kq") * F.col("__kp"))).cast("bigint")
    q_only = F.sum(F.col("__kq") * (1 - F.col("__kp"))).cast("bigint")
    p_only = F.sum((1 - F.col("__kq")) * F.col("__kp")).cast("bigint")
    neither = F.sum((1 - F.col("__kq")) * (1 - F.col("__kp"))).cast("bigint")
    return (
        flags.groupBy(group_col)
        .agg(
            n.cast("bigint").alias("n_docs"),
            both.alias("n_both_keep"),
            q_only.alias("n_quality_only"),
            p_only.alias("n_ppl_only"),
            neither.alias("n_both_drop"),
            F.round((both + neither) / n, 4).alias("agree_pct"),
        )
        .orderBy(group_col)
    )


def quality_ks_drift(
    docs: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    round_bp: int = 10000,
) -> DataFrame:
    """Per-source distribution-drift gate: the exact two-sample
    Kolmogorov-Smirnov statistic between a source's quality
    distribution and the REST of the corpus — max |cdf_src - cdf_rest|
    over the merged quality grid. JS token drift (x63) sees vocabulary
    change; this sees score-distribution change within a fixed metric,
    the alarm that one source's quality profile quietly diverged from
    the corpus it's mixed into.

    EXACT and histogram-bounded: quality rounds to 4dp upstream, so the
    corpus reduces to a (source, quality) histogram; the grid is
    (#sources x distinct-quality) rows by construction, the per-source
    cumulative runs over THAT (never corpus rows), and the global cdf
    broadcasts back by grid value. The KS gap is integer-ized to basis
    points before the max, so the 4dp output is a pure integer
    comparison. Returns per source: ``n_docs``, ``ks`` (4dp),
    ``ks_at_quality`` (the grid point attaining it; ties -> largest).

    A degenerate single-source corpus has no rest-of-corpus to compare
    against (n == n_src would divide by zero — NULL under Spark,
    IEEE inf under DuckDB): such sources are dropped (zero output
    rows) rather than emitting an engine-dependent ks.
    """
    from otus_clickhouse_spark.pipeline.text import quality_score

    q = docs.select(F.col(group_col), quality_score(F.col(text_col)).alias("__q"))
    hist = q.groupBy(group_col, "__q").agg(F.count(F.lit(1)).alias("__c"))
    hist = hist.localCheckpoint()  # feeds grid, totals, and the global cdf
    grid = (
        hist.select("__q").distinct()
        .crossJoin(hist.select(group_col).distinct())
        .join(hist, [group_col, "__q"], "left")
        .select(group_col, "__q", F.coalesce("__c", F.lit(0)).alias("__c"))
    )
    w = Window.partitionBy(group_col).orderBy("__q")
    cum = grid.withColumn("__cum", F.sum("__c").over(w))
    gtot = hist.groupBy("__q").agg(F.sum("__c").alias("__gc"))
    wg = Window.orderBy("__q")
    gcum = gtot.withColumn("__gcum", F.sum("__gc").over(wg)).select("__q", "__gcum")
    n_s = hist.groupBy(group_col).agg(F.sum("__c").alias("__ns"))
    n_all = hist.agg(F.sum("__c").alias("__n"))
    j = (
        cum.join(F.broadcast(gcum), "__q")
        .join(F.broadcast(n_s), group_col)
        .crossJoin(F.broadcast(n_all))
        # no rest-of-corpus => no defined KS; drop rather than emit a
        # NULL(Spark)/inf(DuckDB) engine-dependent value
        .where(F.col("__n") > F.col("__ns"))
    )
    gap_bp = F.round(
        F.abs(
            F.col("__cum") / F.col("__ns")
            - (F.col("__gcum") - F.col("__cum")) / (F.col("__n") - F.col("__ns"))
        )
        * round_bp
    ).cast("bigint")
    best = F.max(F.struct(gap_bp.alias("bp"), F.col("__q").alias("q")))
    return (
        j.groupBy(group_col)
        .agg(
            F.min("__ns").cast("bigint").alias("n_docs"),
            (best["bp"] / float(round_bp)).alias("ks"),
            best["q"].alias("ks_at_quality"),
        )
        .orderBy(group_col)
    )


def gate_ablation_matrix(
    docs: DataFrame,
    text_col: str = "text",
    min_tokens: int = 5,
    min_alpha: float = 0.55,
) -> DataFrame:
    """Quality-gate ABLATION matrix: x99 reports each rule's marginal
    reject count; this reports the full pass/fail COMBINATION cells —
    which docs fail exactly {length}, exactly {length, alpha}, etc. —
    the inclusion-exclusion sheet that says whether two gates are
    redundant (their fail sets coincide) or complementary (disjoint),
    i.e. whether dropping a gate would actually admit anything.

    Three gates, all map-side expressions over the token array:
    ``len`` (≥ ``min_tokens`` tokens), ``alpha`` (alphabetic+space
    ratio ≥ ``min_alpha``), ``stop`` (≥ 1 stopword). Output: one row
    per observed (pass_len, pass_alpha, pass_stop) cell with doc count
    and corpus share (4dp from exact integers). One grouped reduce to
    ≤ 8 rows."""
    from otus_clickhouse_spark.pipeline.text import tokens

    toks = tokens(F.col(text_col))
    nc = F.length(F.col(text_col))
    alpha = F.length(
        F.regexp_replace(F.col(text_col), r"[^A-Za-z ]", "")
    ) / F.greatest(nc, F.lit(1))
    sw = F.array(*[F.lit(w) for w in ["the", "a", "and", "of", "to", "in", "is"]])
    gates = docs.select(
        (F.size(toks) >= min_tokens).cast("int").alias("pass_len"),
        (alpha >= min_alpha).cast("int").alias("pass_alpha"),
        (F.size(F.filter(toks, lambda x: F.array_contains(sw, F.lower(x)))) > 0)
        .cast("int")
        .alias("pass_stop"),
    )
    cells = gates.groupBy("pass_len", "pass_alpha", "pass_stop").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    tot = cells.agg(F.sum("n_docs").alias("__n"))
    return (
        cells.crossJoin(F.broadcast(tot))
        .select(
            F.col("pass_len").cast("bigint").alias("pass_len"),
            F.col("pass_alpha").cast("bigint").alias("pass_alpha"),
            F.col("pass_stop").cast("bigint").alias("pass_stop"),
            "n_docs",
            F.round(F.col("n_docs") / F.col("__n"), 4).alias("share"),
        )
        .orderBy("pass_len", "pass_alpha", "pass_stop")
    )
