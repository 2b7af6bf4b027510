"""Deduplication operators for large-scale training-data pipelines.

All hot paths are pure Spark SQL expressions (JVM-side, codegen'd); no
Python UDFs. Hashes use md5 so results are portable/deterministic
across engines (the DuckDB oracle computes the identical pipeline).

Scale notes (100 TB):
- exact dedup: hash-partition on the digest → one shuffle; the digest
  (16 bytes) shuffles instead of the document body when
  ``payload=False``.
- minhash-LSH: explode to (band, doc) pairs → groupBy band bucket →
  within-bucket pair generation. Bucket sizes are bounded by LSH
  design, so the quadratic step is local and small; the shuffle key is
  the band hash (uniform). This is the standard shingle→minhash→band
  →bucket-join plan.
- ngram-jaccard verification joins only LSH candidate pairs, never the
  full cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Minhash "permutations" are affine transforms of ONE md5 digest:
# h = first 32 bits of md5(shingle); mh_i = min((A_i*h + B_i) mod P).
# One hash per shingle instead of one per (shingle, permutation) — ~8×
# less hashing on the hot path — and plain 64-bit arithmetic both Spark
# and DuckDB evaluate identically (A_i*h < 2^62: no overflow either side).
MINHASH_A = (1000000007, 1000000033, 1000000087, 1000000093,
             1000000097, 1000000103, 1000000123, 1000000181)
MINHASH_B = (12345, 67891, 23457, 78913, 34569, 89125, 45671, 91237)
MINHASH_P = 4294967291  # largest 32-bit prime

# Hot-bucket cap for the banded LSH self-join: buckets larger than this
# switch from all-pairs to representative-chaining (every member pairs
# with the bucket's min id only), bounding candidate volume at
# O(cap·n_small + n_big) instead of O(Σ bucket²). A degenerate bucket —
# a million identical boilerplate docs, the classic web-corpus skew —
# would otherwise make the "bounded by bucket size" claim quadratic.
# Members of an over-cap bucket are transitively near-identical, so the
# star topology preserves cluster connectivity for dedup_clusters while
# the exact-Jaccard verify still gates each chained pair.
LSH_MAX_BUCKET = 1024


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: keep the lowest-id representative per content digest."""
    return (
        df.withColumn("__digest", F.md5(F.col(text_col)))
        .groupBy("__digest")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("dup_count"))
        .drop("__digest")
    )


def shingles(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per document (id_col, shingle).

    Distinctness is per-document, so ``array_distinct`` before the
    explode does it map-side — no shuffle at all (a post-explode
    ``.distinct()`` would shuffle every shingle string).
    """
    from otus_clickhouse_spark.io import rebalance

    tokens = F.split(F.col(text_col), " ")
    # n-gram i..i+n-1 joined by space; transform is JVM-side
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(tokens) - n, F.lit(0))),
        lambda i: F.array_join(F.slice(tokens, i + 1, n), " "),
    )
    return (
        rebalance(df, id_col)
        .select(F.col(id_col), F.explode(F.array_distinct(grams)).alias("shingle"))
        .where(F.length("shingle") > 0)
    )


def minhash_signatures(
    sh: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 8,
    with_size: bool = False,
    h_col: str | None = None,
) -> DataFrame:
    """Per-doc minhash signature: min of ``num_hashes`` affine
    permutations of the shingle's 32-bit md5 prefix (single md5 per
    shingle; the permutations are codegen'd integer arithmetic).

    ``with_size`` additionally emits the per-doc distinct-shingle count
    as ``n_sh`` in the SAME aggregation — the Jaccard verify needs those
    set sizes, and computing them here saves a second full pass +
    shuffle over the shingle relation.

    ``h_col``: name of a PRECOMPUTED 32-bit-prefix column on ``sh``
    (the md5-prefix conversion already done, e.g. stored in the
    pipeline's materialized digest relation) — skips re-hashing."""
    assert num_hashes <= len(MINHASH_A)
    h = (
        F.col(h_col)
        if h_col
        else F.conv(F.substring(F.md5("shingle"), 1, 8), 16, 10).cast("bigint")
    )
    aggs = [
        F.min((h * F.lit(MINHASH_A[i]) + F.lit(MINHASH_B[i])) % F.lit(MINHASH_P)).alias(f"mh{i}")
        for i in range(num_hashes)
    ]
    if with_size:
        aggs.append(F.count(F.lit(1)).alias("n_sh"))
    return sh.groupBy(id_col).agg(*aggs)


def lsh_band_buckets(
    sig: DataFrame,
    id_col: str = "doc_id",
    bands: int = 4,
    rows_per_band: int = 2,
) -> DataFrame:
    """The (id, band, band_key) relation every LSH consumer starts from —
    built map-side from the signature table, no shuffle.

    No .distinct(): the band index is hashed INTO the key, so one doc's
    ``bands`` keys are already distinct (barring md5 collisions) — a
    distinct here would shuffle all ``bands``·n rows for nothing.
    Shared by :func:`lsh_candidate_pairs`, :func:`lsh_bucket_skew` and
    :func:`lsh_cap_planning` so a pipeline running generator + monitor +
    planner can compute it (and :func:`lsh_bucket_degrees`) ONCE and
    hand the relation to all three."""
    mh_cols = [c for c in sig.columns if c.startswith("mh")]
    assert len(mh_cols) >= bands * rows_per_band
    entries = [
        F.struct(
            F.lit(b).alias("band"),
            F.md5(
                F.concat_ws(
                    "|",
                    F.lit(b),
                    *[F.col(mh_cols[b * rows_per_band + r]) for r in range(rows_per_band)],
                )
            ).alias("band_key"),
        )
        for b in range(bands)
    ]
    return sig.select(
        F.col(id_col), F.explode(F.array(*entries)).alias("e")
    ).select(id_col, "e.band", "e.band_key")


def lsh_bucket_degrees(buckets: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Bucket degree + min-id representative in ONE pass over the bucket
    relation: (band, band_key, __deg, __rep). The single shared
    aggregation behind the hot-bucket cap (:func:`lsh_candidate_pairs`),
    the skew monitor (:func:`lsh_bucket_skew`) and the cap planner
    (:func:`lsh_cap_planning`) — persist/localCheckpoint the result when
    several of them run in the same pipeline pass and each consumer
    reuses one shuffle instead of recomputing its own.

    Grouping by band_key alone would give identical degrees (the band
    index is hashed into the key); ``band`` rides along via min() so the
    skew sheet can split by band without a second pass."""
    return buckets.groupBy("band_key").agg(
        F.min("band").alias("band"),
        F.count(F.lit(1)).alias("__deg"),
        F.min(id_col).alias("__rep"),
    )


def lsh_candidate_pairs(
    sig: DataFrame,
    id_col: str = "doc_id",
    bands: int = 4,
    rows_per_band: int = 2,
    max_bucket: int = LSH_MAX_BUCKET,
    buckets: DataFrame | None = None,
    degrees: DataFrame | None = None,
) -> DataFrame:
    """Band the signature; docs sharing any band bucket become candidates.

    Returns distinct (a, b) pairs with a < b. The per-bucket self-join
    is the only quadratic step, and ``max_bucket`` bounds it: buckets up
    to the cap generate all pairs; over-cap (degenerate boilerplate)
    buckets chain every member to the bucket's min-id representative
    instead — O(bucket) pairs, connectivity preserved for
    :func:`dedup_clusters` (over-cap members are transitively
    near-identical, and the Jaccard verify still gates each pair). Same
    fix class as ``substring_dup_pairs``' ``max_bucket`` and decontam's
    ``max_gram_df``; without it one hot bucket makes candidate volume
    quadratic at 100 TB (measured: pairs grew 107x on a 10x corpus step
    before the cap — SCALE.md round-9).

    ``buckets``/``degrees``: pass precomputed (ideally persisted)
    :func:`lsh_band_buckets` / :func:`lsh_bucket_degrees` relations when
    the skew monitor (x87) or cap planner (x123) runs in the same
    pipeline pass — the degree aggregation is the cap's whole overhead,
    and pooling it refunds that cost.
    """
    if buckets is None:
        buckets = lsh_band_buckets(sig, id_col, bands, rows_per_band)
    # the explicit repartition sits BELOW the window/join: the user
    # REPARTITION_BY_COL exchange satisfies their required distribution
    # (it REPLACES the ENSURE_REQUIREMENTS shuffle instead of adding
    # one) and AQE will not coalesce it — size-based coalescing would
    # funnel the n²-per-bucket pair EXPANSION through 1-2 tasks (the
    # x06/x10 sf1 finding; standing guard
    # test_no_aqe_coalescible_pair_expansion_joins). A repartition
    # placed AFTER the window would be planner-elided as redundant.
    nparts = int(buckets.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    narrow = buckets.select(F.col(id_col), "band_key").repartition(
        nparts, "band_key"
    )
    if degrees is not None:
        # pooled path: the shared degree relation is already materialized
        # (persist/localCheckpoint by the caller) — join it back.
        ann = narrow.join(
            degrees.select("band_key", "__deg", "__rep"), "band_key"
        )
    else:
        # solo path: annotate degree + representative with ONE window
        # shuffle over band_key (high-cardinality key; measured ~35%
        # faster than groupBy+join-back at sf0.1 — no second exchange).
        from pyspark.sql import Window

        w = Window.partitionBy("band_key")
        ann = narrow.withColumn("__deg", F.count(F.lit(1)).over(w)).withColumn(
            "__rep", F.min(id_col).over(w)
        )
    # `deg > 1` drops singleton buckets (the vast majority) before the
    # self-join ever sees them — they cannot produce a pair.
    sm = ann.where((F.col("__deg") > 1) & (F.col("__deg") <= max_bucket))
    a = sm.alias("a")
    b = sm.alias("b")
    pairs_small = (
        a.join(b, on="band_key")
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(F.col(f"a.{id_col}").alias("a"), F.col(f"b.{id_col}").alias("b"))
    )
    # rep = min(id) of the bucket, so a < b holds by construction.
    pairs_big = (
        ann.where((F.col("__deg") > max_bucket) & (F.col(id_col) != F.col("__rep")))
        .select(F.col("__rep").alias("a"), F.col(id_col).alias("b"))
    )
    return pairs_small.unionByName(pairs_big).distinct()


def blocked_jaccard_pairs(
    df: DataFrame,
    block_cols: tuple[str, ...] = ("lang", "source"),
    threshold: float = 0.5,
    max_df: int = 10_000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs within metadata blocks via an
    INVERTED-INDEX candidate join (the set-similarity-join shape of
    Vernica/Carey/Li, SIGMOD'10) instead of the n²-per-block cartesian.

    Any pair with Jaccard >= threshold (> 0) shares at least one
    shingle, so candidates are generated ONLY from docs co-occurring in
    a (block, shingle) posting list — work is Σ df² over posting
    degrees, not Σ n² over block sizes (measured at sf1: 15.9M
    cartesian candidates → 1.5M posting pair-slots, 87 s → seconds).
    ``max_df`` is the hot-posting guard (same cap class as
    :func:`lsh_candidate_pairs`'s ``max_bucket``): a degenerate shingle
    shared by millions of docs in one block would make one posting list
    quadratic at 100 TB; over-cap postings are excluded from candidate
    GENERATION (documented recall trade: a pair sharing ONLY over-cap
    boilerplate shingles is missed), bounding candidate work to
    O(max_df · postings) — linear in corpus size. Verification is the
    exact :func:`jaccard_verify` over FULL shingle sets, so every
    emitted jaccard value is exact regardless of the cap.

    Candidate self-join sides carry an EXPLICIT repartition on the
    posting key: the join input is small, so AQE would coalesce the
    pair-expansion onto 1-2 tasks (the x06/x10 sf1 finding — user
    partitioning is exempt from coalescing)."""
    spark = df.sparkSession
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # materialize the hashed shingle relation ONCE (r12, guide §2.3/§5):
    # it feeds FOUR consumers — the posting index, both sides of the
    # verify intersection join, and the per-doc set sizes. Unmaterialized,
    # the tokenize→n-gram→explode subtree (the scan-CPU of this operator)
    # re-ran per consumer; the checkpoint also ships the 8-byte digest
    # instead of shingle strings through every downstream shuffle.
    # localCheckpoint (not persist) per the minhash_dedup_pairs rationale:
    # blocks free on GC, nothing leaks into a long harness session.
    shc = (
        shingles(df, text_col=text_col, id_col=id_col)
        .select(F.col(id_col), F.xxhash64("shingle").alias("__sh"))
        .localCheckpoint()
    )
    sizes = shc.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    meta = df.select(id_col, *block_cols)
    shb = shc.join(meta, id_col)
    keys = [*block_cols, "__sh"]
    from pyspark.sql import Window

    # one window shuffle annotates posting degree (the lsh solo-path
    # pattern); singleton postings — the vast majority — drop before
    # the self-join ever sees them. The repartition sits BELOW the
    # window: the window's required hash distribution is satisfied by
    # the user REPARTITION_BY_COL exchange, which AQE will NOT coalesce
    # — a repartition placed after the window is planner-elided (same
    # partitioning) and the window's own ENSURE_REQUIREMENTS shuffle
    # would feed the pair expansion through 1-2 coalesced tasks.
    ann = shb.repartition(nparts, *keys).withColumn(
        "__df", F.count(F.lit(1)).over(Window.partitionBy(*keys))
    )
    sm = ann.where((F.col("__df") > 1) & (F.col("__df") <= max_df))
    a = sm.select(*keys, F.col(id_col).alias("a"))
    b = sm.select(*keys, F.col(id_col).alias("b"))
    cand = (
        a.join(b, keys)
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    return jaccard_verify(
        cand, shc, id_col=id_col, threshold=threshold, sizes=sizes, hashed=True
    )


def jaccard_verify(
    pairs: DataFrame,
    sh: DataFrame,
    id_col: str = "doc_id",
    threshold: float = 0.7,
    sizes: DataFrame | None = None,
    hashed: bool = False,
) -> DataFrame:
    """Exact n-gram Jaccard on candidate pairs only (a, b, jaccard).

    The intersection join shuffles a 64-bit shingle digest instead of
    the shingle string — same counts (collision odds ~n²/2⁶⁴), a
    fraction of the shuffle bytes. Pass ``sizes`` (``id_col, n_sh``) if
    the per-doc set sizes were already computed upstream (e.g. in the
    signature aggregation) to avoid re-scanning the shingle relation.
    ``hashed=True`` means ``sh`` is already the (id_col, __sh) digest
    relation (ideally materialized by the caller) — skips re-hashing.
    """
    shc = (
        sh
        if hashed
        else sh.select(F.col(id_col), F.xxhash64("shingle").alias("__sh"))
    )
    if sizes is None:
        sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    # Size-bound prefilter BEFORE the intersection join (r13, guide
    # §3.2 — prune the big join's input; the set-similarity length
    # filter of Arasu/Ganti/Kaushik VLDB'06): J(A,B) >= t requires
    # |A∩B| >= t·|A∪B|, and |A∩B| <= min(na,nb), |A∪B| >= max(na,nb),
    # so any emitted pair has min(na,nb) >= t·max(na,nb). The emitted
    # value is round(j,4) >= t, which j >= t - 5e-5 suffices for, so
    # filtering with (t - 1e-4) keeps every pair the final predicate
    # can keep — results are IDENTICAL, only never-passing pairs skip
    # the shingle-intersection join. The size joins move in front of
    # the intersection (same join count, the pair relation is tiny
    # either way); na/nb then ride through the aggregation.
    tight = F.lit(float(threshold) - 1e-4)
    annotated = (
        pairs.join(sizes.select(F.col(id_col).alias("a"), F.col("n_sh").alias("na")), on="a")
        .join(sizes.select(F.col(id_col).alias("b"), F.col("n_sh").alias("nb")), on="b")
        .where(F.least("na", "nb") >= tight * F.greatest("na", "nb"))
    )
    sa = shc.select(F.col(id_col).alias("a"), F.col("__sh"))
    sb = shc.select(F.col(id_col).alias("b"), F.col("__sh"))
    common = (
        annotated.join(sa, on="a")
        .join(sb, on=["b", "__sh"])
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("inter"), F.first("na").alias("na"), F.first("nb").alias("nb"))
    )
    out = (
        common.withColumn(
            "jaccard", F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 4)
        )
        .where(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )
    return out


def minhash_dedup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.7,
    persist_shingles: bool = True,
) -> DataFrame:
    """Full near-dup pipeline: shingle → minhash → LSH → Jaccard verify.

    The shingle relation feeds three consumers (signatures + both sides
    of the verify join); without materialization Spark recomputes the
    tokenize/explode/distinct subtree three times. We localCheckpoint it
    (materialized once, blocks freed on GC — persist() entries outlive
    the returned plan and leak across a long harness run) — at cluster
    scale this is the step you'd write to an intermediate table anyway
    (it's the unit of incremental recompute for new docs).

    r12 (guide §2.3): the materialized relation stores the two DIGESTS
    (the signature's 32-bit md5 prefix + the verify join's xxhash64),
    not the shingle string — both hashes are computed exactly once in
    the single pass feeding the checkpoint (the string form computed
    md5 once at the signature agg and xxhash64 once per verify SIDE),
    and every downstream shuffle/storage byte is two longs per row
    instead of an n-gram string.
    """
    sh = shingles(df, text_col, id_col, n).select(
        F.col(id_col),
        F.conv(F.substring(F.md5("shingle"), 1, 8), 16, 10)
        .cast("bigint")
        .alias("__h32"),
        F.xxhash64("shingle").alias("__sh"),
    )
    if persist_shingles:
        sh = sh.localCheckpoint()
    sig = minhash_signatures(
        sh, id_col, with_size=True, h_col="__h32"
    ).localCheckpoint()
    cand = lsh_candidate_pairs(sig, id_col)
    return jaccard_verify(
        cand,
        sh.select(id_col, "__sh"),
        id_col,
        threshold,
        sizes=sig.select(id_col, "n_sh"),
        hashed=True,
    )


def dedup_clusters(pairs: DataFrame, a_col: str = "a", b_col: str = "b", max_iter: int = 25) -> DataFrame:
    """Group near-dup pairs into clusters: connected components by
    min-label propagation. Returns (node, cluster_id) where cluster_id
    is the smallest doc id in the component.

    Each round is one shuffle (neighbor-min join + groupBy); rounds
    needed = graph diameter. LSH dup components are near-cliques
    (every member shares a band bucket), so diameter is tiny and this
    converges in 2-3 rounds regardless of corpus size — the iterative
    cost is O(edges) per round, all JVM-side. The final round's count
    action doubles as the convergence check.
    """
    # pairs may be an expensive upstream pipeline (LSH); materialize once
    # before symmetrizing, or both union branches recompute it. If the
    # CALLER already persisted it, respect that: persist/unpersist act
    # on the shared DataFrame, and unpersisting a caller's cache would
    # silently recompute their whole upstream pipeline (ADVICE r11).
    caller_cached = pairs.storageLevel.useMemory or pairs.storageLevel.useDisk
    if not caller_cached:
        pairs = pairs.persist()
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .union(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels.select(F.col("node").alias("dst"), "label"), on="dst")
            .groupBy("src")
            .agg(F.min("label").alias("nlabel"))
            .withColumnRenamed("src", "node")
        )
        # localCheckpoint truncates the per-round lineage so plan analysis
        # stays O(1) across iterations (on a multi-node cluster with
        # fault-tolerance requirements, use checkpoint() to durable storage).
        new_labels = (
            labels.join(neighbor_min, on="node", how="left")
            .select("node", F.least("label", F.coalesce("nlabel", "label")).alias("label"))
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), on="node")
            .where(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
    # labels are localCheckpointed (independent of the input lineage), so
    # the pairs cache can go too — leaving it pinned leaked a full
    # upstream pipeline per call across a long session (r11 sf1 gate:
    # accumulated leaks put the 252-query session into GC thrash).
    # Only drop the cache WE introduced, never the caller's.
    if not caller_cached:
        pairs.unpersist()
    return labels.select(F.col("node"), F.col("label").alias("cluster_id"))


def simhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 16
) -> DataFrame:
    """Per-doc SimHash over whitespace tokens (portable md5-derived bits).

    Token hash = first 8 hex chars of md5 → 32-bit int; simhash bit b is
    the sign of sum(±1) of token bit b. Pure SQL expressions throughout.
    """
    from otus_clickhouse_spark.io import rebalance

    tok = rebalance(df, id_col).select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    ).where(F.length("tok") > 0)
    h = F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("bigint")
    tok = tok.withColumn("h", h)
    bit_sums = tok.groupBy(id_col).agg(
        *[
            F.sum(F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)).alias(f"b{b}")
            for b in range(bits)
        ]
    )
    sim = bit_sums.select(
        F.col(id_col),
        sum(
            [F.when(F.col(f"b{b}") > 0, F.lit(2**b)).otherwise(F.lit(0)) for b in range(bits)],
            F.lit(0),
        ).cast("bigint").alias("simhash"),
    )
    return sim


def embedding_neardup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    block_col: str | None = "label",
    threshold: float = 0.95,
    n_salts: int = 8,
    n_partitions: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-dup: blocked pairwise cosine ≥ threshold.

    ``block_col`` bounds the quadratic step (at scale: LSH/IVF bucket id
    from :mod:`similarity`); within-block pairs are generated by an
    equi-join — but a NAIVE join on the block key alone falls over at
    scale for a subtle reason the sf1 gate measured directly: AQE sizes
    post-shuffle partitions from the join's INPUT bytes, and the pair
    expansion happens after, so the n² cosine work coalesced onto 2
    tasks (342 s at sf1). Fix: the standard salted sub-block self-join —
    split each block into ``n_salts`` hash groups, enumerate the
    (ga ≤ gb) group combos (broadcast, ~g²/2 rows), join on
    (block, gb) with an EXPLICIT repartition count (user-specified
    partitioning is exempt from AQE coalescing). Each unordered pair
    appears exactly once: same-group pairs take a < b, cross-group pairs
    are canonicalized with least/greatest — no distinct needed.
    """
    from otus_clickhouse_spark.pipeline.similarity import dot, norm

    spark = df.sparkSession
    nparts = n_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    # per-vector norm ONCE map-side: cosine() recomputes both norms per
    # PAIR — 2/3 of the pairwise fold work; dot/(na·nb) is bit-identical
    # (same fold order, sqrt of the same sum — the r12 x32 finding)
    base = df.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"),
        *( [F.col(block_col)] if block_col else [F.lit(0).alias("__blk")] )
    ).withColumn("__nrm", norm(F.col("v")))
    blk = block_col or "__blk"
    g = max(int(n_salts), 1)
    combos = F.broadcast(
        spark.createDataFrame(
            [(ga, gb) for ga in range(g) for gb in range(ga, g)],
            "ga int, gb int",
        )
    )
    a = base.select(
        F.col(id_col).alias("a"), F.col("v").alias("va"), F.col(blk),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(g)).cast("int").alias("ga"),
        F.col("__nrm").alias("__na"),
    ).join(combos, "ga")
    b = base.select(
        F.col(id_col).alias("b"), F.col("v").alias("vb"), F.col(blk),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(g)).cast("int").alias("gb"),
        F.col("__nrm").alias("__nb"),
    )
    pairs = (
        a.repartition(nparts, blk, "gb")
        .join(b.repartition(nparts, blk, "gb"), on=[blk, "gb"])
        .where((F.col("ga") < F.col("gb")) | (F.col("a") < F.col("b")))
        .withColumn(
            "cos",
            F.round(
                dot(F.col("va"), F.col("vb")) / (F.col("__na") * F.col("__nb")), 4
            ),
        )
        .where(F.col("cos") >= threshold)
    )
    return pairs.select(
        F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"), "cos"
    )


def substring_dup_pairs(
    df: DataFrame,
    window: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket: int = 1024,
) -> DataFrame:
    """Exact substring dedup: documents sharing any ``window``-token
    contiguous span (the distributed analogue of suffix-array ExactSubstr
    dedup, Lee et al. 2022, "Deduplicating Training Data Makes Language
    Models Better").

    Plan: stride-1 token windows per doc (map-side sequence+transform —
    no shuffle until windows are hashed), md5 each window, dedupe
    per-doc with array_distinct before the explode, drop singleton
    fingerprints with a pre-aggregation, then pair up bucket-locally.
    The shuffle ships (16-byte fingerprint, id) pairs only — never the
    window text. ``max_bucket`` caps the bucket-local quadratic step:
    a boilerplate window shared by millions of docs (the classic skew
    case) is dropped rather than exploded; at 100 TB that cap is the
    difference between a bounded job and a quadratic one.

    Returns distinct (a, b, n_shared) pairs with a < b and the count of
    shared window fingerprints.
    """
    from otus_clickhouse_spark.pipeline.text import tokens

    staged = df.select(
        F.col(id_col), tokens(F.col(text_col)).alias("__toks")
    ).where(F.size(F.col("__toks")) >= window)
    wfps = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.size(F.col("__toks")) - window),
            lambda i: F.md5(F.array_join(F.slice(F.col("__toks"), i + 1, window), " ")),
        )
    )
    w = staged.select(F.col(id_col), F.explode(wfps).alias("win_fp"))
    shared_fps = (
        w.groupBy("win_fp")
        .agg(F.count(F.lit(1)).alias("deg"))
        .where((F.col("deg") > 1) & (F.col("deg") <= max_bucket))
        .select("win_fp")
    )
    sh = w.join(shared_fps, "win_fp")
    # AQE-exempt repartition before the pair expansion (see
    # lsh_candidate_pairs — same coalesce-collapse class)
    nparts = int(sh.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    a = sh.select(F.col(id_col).alias("a"), "win_fp").repartition(nparts, "win_fp")
    b = sh.select(F.col(id_col).alias("b"), "win_fp").repartition(nparts, "win_fp")
    return (
        a.join(b, "win_fp")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


def winnow_dup_pairs(
    df: DataFrame,
    k: int = 8,
    w: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket: int = 1024,
    min_shared: int = 1,
) -> DataFrame:
    """Robust-winnowing near-dup pairs (Schleimer, Wilkerson & Aiken,
    SIGMOD'03 — the MOSS fingerprinting algorithm).

    Character ``k``-grams of the whitespace-squashed lowercased text
    are hashed; each sliding window of ``w`` consecutive gram hashes
    contributes its MINIMUM hash as a fingerprint. That subsampling
    keeps only ~2/(w+1) of the gram hashes yet still guarantees any
    shared substring of length >= w + k - 1 produces at least one
    shared fingerprint — the fingerprint-budget version of the stride-1
    plan in :func:`substring_dup_pairs`: at 100 TB the winnowed index
    is (w+1)/2 x smaller for the same detection floor.

    Plan shape: gram hashing and window-min selection are ONE map-side
    pass (sequence/transform/slice/array_min HOFs, all codegen'd;
    ``array_distinct`` dedups per doc before the explode). The explode
    ships (id, fingerprint) rows only; a pre-aggregation drops
    singleton fingerprints and caps bucket degree at ``max_bucket``
    (boilerplate shared by millions of docs is dropped, not exploded),
    then pairs form bucket-locally. Returns (a, b, n_shared), a < b.

    Gram hash (r12 restage): a position-weighted Karp-Rabin polynomial
    H = Σ code(cᵢ₊ⱼ)·B^(k-1-j) mod M (B=257, M=2³¹-1) — pure integer
    arithmetic in whole-stage codegen, mirrored exactly by the DuckDB
    oracle and the tests' Python reference. The previous
    md5-per-position hash was the sf1 wall: ~280 md5+hex-conv calls per
    doc dominated the whole pipeline (48 s of x68's 89 s at sf1,
    recomputed per DAG branch). Same 31-bit collision envelope as the
    md5 prefix it replaces. The fingerprint relation flows through ONE
    user repartition exchange (r13): degree rides as a window over it
    and both self-join sides reuse the same shuffle output, so the
    hashing scan runs exactly once as that exchange's map stage — no
    checkpoint barrier, no second round of fp shuffles."""
    from otus_clickhouse_spark.io import rebalance

    B, M = 257, 2147483647
    pw = [pow(B, k - 1 - j, M) for j in range(k)]
    norm = F.lower(F.regexp_replace(F.col(text_col), "[ \\t\\r\\n]+", " "))
    # a small corpus arrives as 1-2 file splits; the hashing pass below
    # is the CPU-heavy stage and must not run on 2 of 32 cores (the r12
    # sf1 profile: 48 s of the 89 s wall was this stage at parallelism 2)
    staged = rebalance(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col), norm.alias("__t")
    ).where(F.length("__t") >= k + w - 1)
    codes = F.transform(
        F.split(F.col("__t"), ""), lambda ch: F.ascii(ch).cast("long")
    )
    staged = staged.select(F.col(id_col), codes.alias("__c"))
    # direct element_at indexing (r12, guide §1.2 step 2 — per-task
    # work): the slice+zip_with+aggregate form allocated three arrays
    # per gram position; indexing the k terms straight out of __c is
    # the same left-to-right exact-integer sum (longs, < 2^55 — no
    # overflow either way) and measured 3.0× faster on a 20k-doc
    # microbench (2.61 s → 0.86 s median, interleaved A/B)
    def _gram(i):
        s = None
        for j, p in enumerate(pw):
            term = F.element_at(F.col("__c"), i + F.lit(j)) * F.lit(p)
            s = term if s is None else s + term
        return s % M

    grams = F.transform(F.sequence(F.lit(1), F.size("__c") - (k - 1)), _gram)
    staged = staged.select(F.col(id_col), grams.alias("__g"))
    # window min via least() over w direct element_at terms (r12, guide
    # §1.2 step 2 — same class as the gram-hash direct indexing above):
    # array_min(slice(...)) allocated a w-array per window position;
    # least() compares the same w non-null longs with no allocation.
    # Bounds guarantee full windows, values are never null, so the
    # result is the identical minimum (measured 0.76 s → 0.68 s on the
    # sf0.1 fingerprint stage, interleaved A/B, values asserted equal).
    # w == 1 degenerates to the gram hash itself (F.least needs >= 2
    # columns — ADVICE r12); w is a public API parameter.
    def _win_min(j):
        if w == 1:
            return F.element_at(F.col("__g"), j)
        return F.least(
            *[F.element_at(F.col("__g"), j + F.lit(i)) for i in range(w)]
        )

    fps = F.array_distinct(
        F.transform(F.sequence(F.lit(1), F.size("__g") - (w - 1)), _win_min)
    )
    fp = staged.select(F.col(id_col), F.explode(fps).alias("fp"))
    # One user exchange carries the whole pipeline (r13, guide §2.4 —
    # the lsh_candidate_pairs solo-path shape): the fingerprint
    # relation repartitions ONCE by fp (AQE-exempt, so size-based
    # coalescing can never funnel the pair expansion into 1-2 tasks),
    # degree is annotated by a window over that exchange, and BOTH
    # self-join sides read the SAME shuffle output (runtime
    # ReusedExchange) — so the CPU-heavy hashing scan above runs
    # exactly once as the exchange's map stage and the former
    # localCheckpoint (an eager barrier + a second round of fp
    # shuffles: degree agg, join-back, two repartitions) is deleted
    # outright. Measured at sf1 (x68 shape): 7.11 s → 5.33 s median,
    # 4/4 interleaved wins, results bit-equal.
    from pyspark.sql import Window

    nparts = int(fp.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    narrow = fp.repartition(nparts, "fp")
    ann = narrow.withColumn("__deg", F.count(F.lit(1)).over(Window.partitionBy("fp")))
    sm = ann.where((F.col("__deg") > 1) & (F.col("__deg") <= max_bucket)).select(
        id_col, "fp"
    )
    a = sm.select(F.col(id_col).alias("a"), "fp")
    b = sm.select(F.col(id_col).alias("b"), "fp")
    out = (
        a.join(b, "fp")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    if min_shared > 1:
        out = out.where(F.col("n_shared") >= min_shared)
    return out


def normalized_dup_tiers(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Duplicate-mass diagnostic across normalization tiers: how much
    of the corpus collapses under (0) exact bytes, (1) casefold,
    (2) + whitespace squash, (3) + punctuation strip. The standard
    pre-flight before choosing an exact-dedup key — the tier deltas
    say whether near-exact dups are a casing/formatting artifact or
    real content repetition.

    ONE corpus scan: all four digests are computed map-side and
    exploded as (tier, digest) rows, so the only shuffle keys on
    (tier, 16-byte digest) — 4x the rows of one exact-dedup pass,
    never 4 scans. Returns per tier: n_docs, n_groups, n_dup_docs
    (docs sharing a digest with another), max_group.
    """
    t0 = F.col(text_col)
    t1 = F.lower(t0)
    t2 = F.regexp_replace(t1, "[ \\t\\r\\n]+", " ")
    t3 = F.trim(F.regexp_replace(F.regexp_replace(t1, "[^a-z0-9]+", " "), " +", " "))
    tiers = F.array(
        *[
            F.struct(F.lit(i).alias("tier"), F.md5(t).alias("digest"))
            for i, t in enumerate((t0, t1, t2, t3))
        ]
    )
    exploded = df.select(F.explode(tiers).alias("x")).select("x.tier", "x.digest")
    groups = exploded.groupBy("tier", "digest").agg(F.count(F.lit(1)).alias("c"))
    return (
        groups.groupBy("tier")
        .agg(
            F.sum("c").alias("n_docs"),
            F.count(F.lit(1)).alias("n_groups"),
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(F.lit(0))).alias("n_dup_docs"),
            F.max("c").alias("max_group"),
        )
    )


def minhash_estimate_eval(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 8,
    round_at: int = 6,
) -> DataFrame:
    """Signature-fidelity eval for the MinHash config: on every LSH
    candidate pair (with ≥1 common shingle), compare the minhash
    ESTIMATE of Jaccard — the fraction of agreeing signature components
    — against the EXACT shingle Jaccard. x02 applies a config, x53
    sweeps banding recall; this measures the estimator itself (bias +
    MAE), the number that justifies num_hashes before a 100 TB run.
    Returns ONE row: (n_pairs, mean_exact, mean_est, bias, mae).

    Scale shape: identical machinery to minhash_dedup_pairs (shingle →
    signature → banded candidates → digest-join exact Jaccard) plus two
    signature-keyed broadcast-sized joins; the quadratic step stays
    bucket-bounded."""
    # digests materialized, not strings (r12 — same pattern as
    # minhash_dedup_pairs): both hashes computed once in the checkpoint
    # pass, every downstream byte is two longs per row
    sh = shingles(df, text_col, id_col, n).select(
        F.col(id_col),
        F.conv(F.substring(F.md5("shingle"), 1, 8), 16, 10)
        .cast("bigint")
        .alias("__h32"),
        F.xxhash64("shingle").alias("__sh"),
    ).localCheckpoint()
    sig = minhash_signatures(
        sh, id_col, num_hashes=num_hashes, with_size=True, h_col="__h32"
    ).localCheckpoint()
    cand = lsh_candidate_pairs(sig, id_col)
    exact = jaccard_verify(
        cand,
        sh.select(id_col, "__sh"),
        id_col,
        threshold=0.0,
        sizes=sig.select(id_col, "n_sh"),
        hashed=True,
    )
    sa = sig.select(
        F.col(id_col).alias("a"), *[F.col(f"mh{i}").alias(f"__a{i}") for i in range(num_hashes)]
    )
    sb = sig.select(
        F.col(id_col).alias("b"), *[F.col(f"mh{i}").alias(f"__b{i}") for i in range(num_hashes)]
    )
    est = sum(
        (F.col(f"__a{i}") == F.col(f"__b{i}")).cast("int") for i in range(num_hashes)
    ) / F.lit(float(num_hashes))
    per_pair = (
        exact.join(sa, "a").join(sb, "b").select("a", "b", F.col("jaccard").alias("__ex"), est.alias("__est"))
    )
    return per_pair.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.round(F.avg("__ex"), round_at).alias("mean_exact"),
        F.round(F.avg("__est"), round_at).alias("mean_est"),
        F.round(F.avg(F.col("__est") - F.col("__ex")), round_at).alias("bias"),
        F.round(F.avg(F.abs(F.col("__est") - F.col("__ex"))), round_at).alias("mae"),
    )


def source_overlap(
    docs: DataFrame,
    top_n: int = 15,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    n: int = 3,
) -> DataFrame:
    """Pairwise shingle-set Jaccard BETWEEN sources — the corpus-level
    overlap matrix a curation run reads before mixing sources (two
    crawls of the same sites show up here long before doc-level dedup
    finds the pairs). Top ``top_n`` source pairs by Jaccard.

    Scale shape: shingles build map-side per doc, reduce to the
    DISTINCT (source, shingle) relation (one shuffle keyed on the
    shingle — never doc bodies), and the pair expansion is a
    shingle-keyed self-join whose per-key fanout is bounded by
    #sources² (a constant ~20² regardless of corpus size); per-source
    set sizes are a #sources-row broadcast. orderBy+limit plans as
    TakeOrderedAndProject."""
    sh = shingles(docs, text_col=text_col, id_col=id_col, n=n)
    ss = (
        sh.join(docs.select(id_col, source_col), id_col)
        .select(source_col, "shingle")
        .distinct()
    )
    sizes = ss.groupBy(source_col).agg(F.count(F.lit(1)).alias("__n"))
    # AQE-exempt repartition before the shingle-keyed pair expansion
    # (see lsh_candidate_pairs — same coalesce-collapse class; fanout
    # is #sources²-bounded per key but input-size-based coalescing
    # would still serialize the expansion)
    nparts = int(ss.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    ss = ss.repartition(nparts, "shingle")
    a, b = ss.alias("a"), ss.alias("b")
    pairs = (
        a.join(b, "shingle")
        .where(F.col(f"a.{source_col}") < F.col(f"b.{source_col}"))
        .groupBy(
            F.col(f"a.{source_col}").alias("source_a"),
            F.col(f"b.{source_col}").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
    )
    za = sizes.select(F.col(source_col).alias("source_a"), F.col("__n").alias("__na"))
    zb = sizes.select(F.col(source_col).alias("source_b"), F.col("__n").alias("__nb"))
    return (
        pairs.join(F.broadcast(za), "source_a")
        .join(F.broadcast(zb), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_shared",
            F.round(
                F.col("n_shared")
                / (F.col("__na") + F.col("__nb") - F.col("n_shared")),
                4,
            ).alias("jaccard"),
        )
        .orderBy(F.desc("jaccard"), "source_a", "source_b")
        .limit(top_n)
    )


def lsh_bucket_skew(
    sig: DataFrame,
    id_col: str = "doc_id",
    bands: int = 4,
    rows_per_band: int = 2,
    degrees: DataFrame | None = None,
) -> DataFrame:
    """Per-band LSH bucket-size diagnostic: bucket count, largest
    bucket, and the implied candidate-pair volume sum(s·(s−1)/2) — the
    SKEW sheet for the banded self-join (lsh_candidate_pairs' quadratic
    step is per-bucket, so one hot bucket IS the straggler task at
    100 TB; this query is how the banding config gets caught before
    that happens — the same class of check as x31/x68's max_bucket and
    x79's max_gram_df).

    Scale shape: band keys build map-side from the signature table, the
    only shuffle keys on band_key (pooled :func:`lsh_bucket_degrees` —
    pass ``degrees`` to reuse the generator's or planner's pass), and
    the output reduces to #bands rows."""
    if degrees is None:
        degrees = lsh_bucket_degrees(
            lsh_band_buckets(sig, id_col, bands, rows_per_band), id_col
        )
    sizes = degrees.select("band", F.col("__deg").alias("__s"))
    return (
        sizes.groupBy("band")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
            F.sum("__s").cast("bigint").alias("n_docs"),
            F.max("__s").cast("bigint").alias("max_bucket"),
            # s·(s−1) is even: shiftright halves exactly in bigint (same
            # >2^53 exactness rationale as lsh_cap_planning)
            F.sum(F.shiftright(F.col("__s") * (F.col("__s") - 1), 1))
            .cast("bigint")
            .alias("candidate_pairs"),
        )
        .select(
            F.col("band").cast("bigint").alias("band"),
            "n_buckets",
            "n_docs",
            "max_bucket",
            "candidate_pairs",
        )
        .orderBy("band")
    )


def lsh_cap_planning(
    docs: DataFrame,
    caps: tuple[int, ...] = (2, 4, 1024),
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    degrees: DataFrame | None = None,
) -> DataFrame:
    """Hot-bucket cap capacity sheet: for each candidate ``max_bucket``
    value, what the banded join would cost WITH and WITHOUT the cap —
    computed entirely from the bucket-degree histogram in O(#buckets),
    never by generating a single pair. x87 (lsh_bucket_skew) measures
    the skew; this prices the mitigation: per cap, the multi-member
    bucket count, buckets the cap would rep-chain, the all-pairs
    candidate volume Σ d·(d−1)/2, the capped volume
    Σ_{d≤cap} d·(d−1)/2 + Σ_{d>cap} (d−1), and the retained fraction.
    "Volume" is the self-join's row count before pair-level distinct —
    the actual join cost driver (a pair sharing k band buckets counts
    k times, exactly as the join materializes it).

    Scale shape: shingle → signature → one (band_key) histogram
    aggregation (pooled :func:`lsh_bucket_degrees` — pass ``degrees``
    to reuse the generator's or monitor's pass); the cap sweep is a
    broadcast cross join against the #caps-row list and reduces
    straight to #caps rows. All counts are exact integers."""
    if degrees is None:
        sh = shingles(docs, text_col, id_col, n)
        sig = minhash_signatures(sh, id_col)
        degrees = lsh_bucket_degrees(lsh_band_buckets(sig, id_col), id_col)
    deg = degrees.select(F.col("__deg").alias("__d")).where(F.col("__d") > 1)
    caps_df = F.broadcast(
        docs.sparkSession.createDataFrame([(int(c),) for c in caps], "cap long")
    )
    d = F.col("__d")
    # d·(d−1) is always even, so shiftright halves it EXACTLY in bigint —
    # double-division would lose integer exactness past 2^53, which is
    # precisely the 100 TB-planning regime this sheet prices.
    pairs_exact = F.shiftright(d * (d - 1), 1)
    capped_pairs = F.when(d <= F.col("cap"), pairs_exact).otherwise(d - 1)
    return (
        deg.crossJoin(caps_df)
        .groupBy("cap")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shared_buckets"),
            F.sum((d > F.col("cap")).cast("int")).cast("bigint").alias("n_over_cap"),
            F.sum(pairs_exact).cast("bigint").alias("allpairs_volume"),
            F.sum(capped_pairs).cast("bigint").alias("capped_volume"),
        )
        .select(
            "cap",
            "n_shared_buckets",
            "n_over_cap",
            "allpairs_volume",
            "capped_volume",
            F.round(F.col("capped_volume") / F.col("allpairs_volume"), 4).alias(
                "retained_frac"
            ),
        )
        .orderBy("cap")
    )


def jaccard_threshold_curve(
    docs: DataFrame,
    thresholds: tuple[float, ...] = (0.5, 0.6, 0.7, 0.8, 0.9),
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Dedup aggressiveness curve: for each candidate Jaccard
    threshold, how many verified near-dup pairs survive and how many
    DOCUMENTS they touch — the table a pipeline owner reads to pick
    the production threshold (x53 tunes the banding; this tunes the
    verify cut on a FIXED banding). The full candidate set verifies
    ONCE (threshold=0 keeps every candidate with its exact Jaccard);
    the sweep is then a tiny cross join of candidate-bounded pairs ×
    #thresholds.

    Scale shape: identical to x02 up to the verified-pairs table
    (bucketed, candidate-only verify); everything after is bounded by
    candidates × thresholds."""
    pairs = minhash_dedup_pairs(docs, text_col=text_col, id_col=id_col, threshold=0.0)
    pairs = pairs.localCheckpoint()  # reused by both sweep aggregates
    th = F.explode(
        F.array(*[F.lit(float(t)) for t in thresholds])
    ).alias("threshold")
    pt = pairs.select(th, "a", "b", "jaccard").where(
        F.col("jaccard") >= F.col("threshold")
    )
    per_pair = pt.groupBy("threshold").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs")
    )
    docs_touched = (
        pt.select("threshold", F.col("a").alias("d"))
        .unionByName(pt.select("threshold", F.col("b").alias("d")))
        .groupBy("threshold")
        .agg(F.count_distinct("d").cast("bigint").alias("n_docs"))
    )
    zero = F.lit(0).cast("bigint")
    base = docs.sparkSession.createDataFrame(
        [(float(t),) for t in thresholds], "threshold double"
    )
    return (
        base.join(per_pair, "threshold", "left")
        .join(docs_touched, "threshold", "left")
        .select(
            "threshold",
            F.coalesce("n_pairs", zero).alias("n_pairs"),
            F.coalesce("n_docs", zero).alias("n_docs"),
        )
        .orderBy("threshold")
    )


def neardup_source_matrix(
    docs: DataFrame,
    threshold: float = 0.7,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Where the near-dup mass COMES FROM: verified pairs (exact
    Jaccard >= threshold) attributed to their source pair — the sheet
    that distinguishes a source duplicating ITSELF (within-source
    pairs: re-crawls, mirrors) from two sources duplicating EACH OTHER
    (cross-source pairs: syndication) before x12's clusters collapse
    them. Source pairs are unordered (least/greatest).

    Scale shape: x02's bucketed candidate+verify chain, then two
    id-keyed joins to attach sources to the candidate-bounded pair
    table and a #source-pairs reduce."""
    pairs = minhash_dedup_pairs(
        docs, text_col=text_col, id_col=id_col, threshold=threshold
    )
    src = docs.select(F.col(id_col), F.col(source_col))
    ab = (
        pairs.join(
            src.select(F.col(id_col).alias("a"), F.col(source_col).alias("__sa")), "a"
        ).join(
            src.select(F.col(id_col).alias("b"), F.col(source_col).alias("__sb")), "b"
        )
    )
    return (
        ab.select(
            F.least("__sa", "__sb").alias("source_a"),
            F.greatest("__sa", "__sb").alias("source_b"),
            "jaccard",
        )
        .groupBy("source_a", "source_b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            # max, not mean: averaging k 4dp values lands exactly on a
            # round-half boundary whenever k is even (0.94925 -> engines
            # disagree by one binary ulp); max is a pure comparison
            F.max("jaccard").alias("max_jaccard"),
        )
        .orderBy(F.desc("n_pairs"), "source_a", "source_b")
    )


def dup_coverage(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    n: int = 3,
) -> DataFrame:
    """Per-source SPAN-level duplication sheet: what fraction of each
    document's distinct shingles also appears in at least one OTHER
    document. Pair-level dedup (x02) answers "which docs are near-dups";
    this answers "how much of this source is duplicated text at all" —
    the number that decides between dropping whole documents and
    stripping shared spans (boilerplate, syndication headers).

    Per source: ``n_docs``; ``dup_shingle_ratio`` — the micro-average
    sum(dup shingles)/sum(shingles), exact integer sums so the single
    division is engine-reproducible; ``n_heavy`` — docs with >= half
    their shingles shared (the pure-integer predicate 2*n_dup >= n_sh,
    no float boundary); ``max_cov_bp`` — the worst doc's coverage in
    basis points.

    Scale shape: shingling is map-side (array_distinct before explode);
    document frequency is ONE hash aggregation keyed by the 64-bit
    shingle digest (never the string); the flag joins back on the same
    digest key; per-doc and per-source reduces are map-side-combined.
    A shingle with df >= 2 appears in >= 2 docs — since shingles are
    per-doc distinct, df counts documents, not occurrences.
    """
    from pyspark.sql import Window

    sh = shingles(docs, text_col, id_col, n).select(
        F.col(id_col), F.xxhash64("shingle").alias("__sh")
    )
    # document frequency via ONE window shuffle over the digest key
    # (r12, guide §2.4): the old groupBy(__sh) + join-back shuffled the
    # shingle relation TWICE (once into the frequency agg, once into
    # the join) and needed a localCheckpoint so the relation wasn't
    # recomputed per consumer; the window annotates __df in place —
    # one shuffle, one consumer, no materialization job. Identical
    # counts (count over the digest partition == joined groupBy count).
    per_doc = (
        sh.withColumn(
            "__df", F.count(F.lit(1)).over(Window.partitionBy("__sh"))
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_sh"),
            F.sum((F.col("__df") >= 2).cast("int")).alias("n_dup"),
        )
    )
    j = per_doc.join(docs.select(F.col(id_col), F.col(source_col)), id_col)
    cov_bp = F.round(F.col("n_dup") * 10000.0 / F.col("n_sh")).cast("bigint")
    return (
        j.groupBy(source_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.round(F.sum("n_dup") / F.sum("n_sh"), 4).alias("dup_shingle_ratio"),
            F.sum((F.col("n_dup") * 2 >= F.col("n_sh")).cast("int"))
            .cast("bigint")
            .alias("n_heavy"),
            F.max(cov_bp).alias("max_cov_bp"),
        )
        .orderBy(source_col)
    )


def band_collision_audit(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    rows_per_band: int = 2,
    max_bucket: int = LSH_MAX_BUCKET,
) -> DataFrame:
    """LSH s-curve audit: does the banding behave like theory says on
    THIS corpus? For every candidate pair, count the bands in which it
    actually collided and compare, per exact-Jaccard decile, against
    the analytic expectation bands * j^rows_per_band. A mismatch means
    the minhash permutations or the shingle distribution are broken
    (e.g. near-constant shingles) BEFORE tuning num_hashes/bands on
    faith — the companion to x78's estimator-fidelity check, one level
    up at the banding layer.

    ``max_bucket`` bounds the audit the same way it bounds the
    candidate generator: buckets over the cap are excluded from the
    band-hit count (their members are transitively near-identical —
    they'd swamp decile 9 while making the self-join quadratic; the
    production generator rep-chains them rather than enumerating
    pairs, so the all-pairs s-curve isn't what runs there either).

    Output per decile: ``jaccard_bin`` (0-9), ``n_pairs``,
    ``mean_bands_hit`` (integer sum / count), ``mean_expected_bands``
    (per-pair expectation integer-ized to basis points before summing,
    so float summation order cannot move the mean across engines).

    Scale shape: identical to x02's candidate machinery — the only
    quadratic step is the per-bucket self-join; the verify is
    candidate-bounded, and pairs that share a band WITHOUT sharing any
    shingle (32-bit prefix collisions) stay in the audit at jaccard 0
    via the left join.
    """
    # digest materialization (r12 — the minhash_dedup_pairs pattern)
    sh = shingles(docs, text_col, id_col, n).select(
        F.col(id_col),
        F.conv(F.substring(F.md5("shingle"), 1, 8), 16, 10)
        .cast("bigint")
        .alias("__h32"),
        F.xxhash64("shingle").alias("__sh"),
    ).localCheckpoint()
    sig = minhash_signatures(
        sh, id_col, num_hashes, with_size=True, h_col="__h32"
    ).localCheckpoint()
    mh_cols = [c for c in sig.columns if c.startswith("mh")]
    band_keys = [
        F.md5(
            F.concat_ws(
                "|",
                F.lit(b),
                *[F.col(mh_cols[b * rows_per_band + r]) for r in range(rows_per_band)],
            )
        ).alias("band_key")
        for b in range(bands)
    ]
    buckets = sig.select(F.col(id_col), F.explode(F.array(*band_keys)).alias("band_key"))
    ok_keys = (
        buckets.groupBy("band_key")
        .agg(F.count(F.lit(1)).alias("__deg"))
        .where((F.col("__deg") > 1) & (F.col("__deg") <= max_bucket))
        .select("band_key")
    )
    bounded = buckets.join(ok_keys, "band_key")
    a, b = bounded.alias("a"), bounded.alias("b")
    hits = (
        a.join(b, "band_key")
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(
            F.col(f"a.{id_col}").alias("a"), F.col(f"b.{id_col}").alias("b")
        )
        .agg(F.count(F.lit(1)).alias("n_bands_hit"))
    )
    verified = jaccard_verify(
        hits.select("a", "b"), sh.select(id_col, "__sh"), id_col, threshold=0.0,
        sizes=sig.select(id_col, "n_sh"), hashed=True,
    )
    scored = hits.join(verified, ["a", "b"], "left").select(
        "n_bands_hit", F.coalesce("jaccard", F.lit(0.0)).alias("j")
    )
    bp = F.round(F.col("j") * 10000).cast("bigint")
    exp_bp = F.round(
        F.pow(F.col("j"), F.lit(rows_per_band)) * bands * 10000
    ).cast("bigint")
    binned = scored.select(
        F.least(F.floor(bp / 1000).cast("bigint"), F.lit(9).cast("bigint")).alias(
            "jaccard_bin"
        ),
        "n_bands_hit",
        exp_bp.alias("__exp_bp"),
    )
    return (
        binned.groupBy("jaccard_bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.round(F.sum("n_bands_hit") / F.count(F.lit(1)), 4).alias(
                "mean_bands_hit"
            ),
            F.round(
                F.sum("__exp_bp") / (F.count(F.lit(1)) * 10000), 4
            ).alias("mean_expected_bands"),
        )
        .orderBy("jaccard_bin")
    )


def dup_cluster_census(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
) -> DataFrame:
    """Cluster-size census over the near-dup graph: how many clusters
    of each size exist, how many documents they hold, and how many are
    droppable (size - 1 per cluster under keep-one-representative) —
    the capacity-planning sheet that turns x02's pairs into "dedup will
    remove N% of the corpus" BEFORE anyone runs the removal.

    Per cluster size: ``cluster_size``, ``n_clusters``, ``n_docs``,
    ``n_droppable``.

    Scale shape: x02's bucketed candidate+verify chain, min-label
    propagation (rounds = component diameter, near-clique components
    converge in 2-3), then a cluster-keyed count and a #distinct-sizes
    histogram reduce. No windows, nothing corpus-sized on one task.
    """
    pairs = minhash_dedup_pairs(docs, text_col=text_col, id_col=id_col, threshold=threshold)
    clusters = dedup_clusters(pairs)
    sizes = clusters.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return (
        sizes.groupBy("cluster_size")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_clusters"))
        .select(
            F.col("cluster_size").cast("bigint").alias("cluster_size"),
            "n_clusters",
            (F.col("cluster_size") * F.col("n_clusters"))
            .cast("bigint")
            .alias("n_docs"),
            ((F.col("cluster_size") - 1) * F.col("n_clusters"))
            .cast("bigint")
            .alias("n_droppable"),
        )
        .orderBy("cluster_size")
    )


def lsh_recall_eval(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_sample: int = 200,
    n: int = 3,
    threshold: float = 0.7,
) -> DataFrame:
    """Ground-truth recall/precision of the LSH candidate generator:
    on a DETERMINISTIC fixed-size sample (md5-ordered top-``k_sample``
    ids — TakeOrderedAndProject, bounded at any corpus size), compute
    ALL true near-dup pairs by exact Jaccard and compare against the
    banded candidates the production pipeline (x02) would generate on
    the same docs. x102 checks the banding against THEORY; this
    measures it against ground truth — the number that justifies the
    bands/rows choice empirically. Brute force is O(k_sample²) BY
    DESIGN and never touches the full corpus: pairs with zero shared
    shingles can't reach any threshold > 0, so the "all pairs" step is
    really the shingle-intersection join within the sample.

    Returns 1 row: ``n_sample``, ``n_true_pairs``, ``n_candidates``,
    ``n_hit`` (candidates that are true pairs), ``recall``,
    ``precision`` (integer divisions, 4dp).
    """
    ids = (
        docs.select(F.col(id_col))
        .orderBy(F.md5(F.col(id_col).cast("string")))
        .limit(k_sample)
    )
    sample = docs.join(F.broadcast(ids), id_col)
    sh = shingles(sample, text_col, id_col, n).localCheckpoint()
    sig = minhash_signatures(sh, id_col, with_size=True).localCheckpoint()
    # ground truth: every intersecting pair in the sample, verified
    shc = sh.select(F.col(id_col), F.xxhash64("shingle").alias("__sh"))
    inter_pairs = (
        shc.alias("a")
        .join(shc.alias("b"), "__sh")
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("a"), F.col(f"b.{id_col}").alias("b")
        )
        .distinct()
    )
    true_pairs = jaccard_verify(
        inter_pairs, sh, id_col, threshold, sizes=sig.select(id_col, "n_sh")
    ).select("a", "b").localCheckpoint()
    cand = lsh_candidate_pairs(sig, id_col).localCheckpoint()
    hit = cand.join(true_pairs, ["a", "b"])
    counts = (
        ids.agg(F.count(F.lit(1)).alias("n_sample"))
        .crossJoin(F.broadcast(true_pairs.agg(F.count(F.lit(1)).alias("n_true_pairs"))))
        .crossJoin(F.broadcast(cand.agg(F.count(F.lit(1)).alias("n_candidates"))))
        .crossJoin(F.broadcast(hit.agg(F.count(F.lit(1)).alias("n_hit"))))
    )
    return counts.select(
        F.col("n_sample").cast("bigint").alias("n_sample"),
        F.col("n_true_pairs").cast("bigint").alias("n_true_pairs"),
        F.col("n_candidates").cast("bigint").alias("n_candidates"),
        F.col("n_hit").cast("bigint").alias("n_hit"),
        F.when(F.col("n_true_pairs") > 0, F.round(F.col("n_hit") / F.col("n_true_pairs"), 4))
        .otherwise(F.lit(1.0))
        .alias("recall"),
        F.when(F.col("n_candidates") > 0, F.round(F.col("n_hit") / F.col("n_candidates"), 4))
        .otherwise(F.lit(1.0))
        .alias("precision"),
    )


def detector_agreement(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    winnow_k: int = 20,
    winnow_w: int = 8,
    min_shared: int = 3,
) -> DataFrame:
    """Agreement sheet between the two span-level near-dup detectors:
    word-shingle minhash-LSH (x02, Jaccard >= ``threshold``) and
    char-gram robust winnowing (x68, >= ``min_shared`` shared
    fingerprints). The two see DIFFERENT duplication — token-level
    rewording vs verbatim character spans — so their pair-set overlap
    is the calibration number that decides which detector (or both)
    a dedup pass should trust, and a sudden divergence flags a
    tokenizer/normalization bug in one of them.

    Returns 1 row: ``n_minhash_pairs``, ``n_winnow_pairs``, ``n_both``,
    ``n_union``, ``pair_set_jaccard`` (one integer division, 4dp).

    Scale shape: both pair generators are their production plans
    (banded buckets / degree-capped fingerprint buckets); the agreement
    itself is one pair-keyed join + scalar counts.
    """
    mp = minhash_dedup_pairs(
        docs, text_col=text_col, id_col=id_col, threshold=threshold
    ).select("a", "b").localCheckpoint()
    wp = winnow_dup_pairs(
        docs, k=winnow_k, w=winnow_w, text_col=text_col, id_col=id_col,
        min_shared=min_shared,
    ).select("a", "b").localCheckpoint()
    both = mp.join(wp, ["a", "b"])
    cts = (
        mp.agg(F.count(F.lit(1)).alias("nm"))
        .crossJoin(F.broadcast(wp.agg(F.count(F.lit(1)).alias("nw"))))
        .crossJoin(F.broadcast(both.agg(F.count(F.lit(1)).alias("nb"))))
    )
    return cts.select(
        F.col("nm").cast("bigint").alias("n_minhash_pairs"),
        F.col("nw").cast("bigint").alias("n_winnow_pairs"),
        F.col("nb").cast("bigint").alias("n_both"),
        (F.col("nm") + F.col("nw") - F.col("nb")).cast("bigint").alias("n_union"),
        F.when(
            F.col("nm") + F.col("nw") - F.col("nb") > 0,
            F.round(F.col("nb") / (F.col("nm") + F.col("nw") - F.col("nb")), 4),
        )
        .otherwise(F.lit(1.0))
        .alias("pair_set_jaccard"),
    )


def cluster_completeness(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
) -> DataFrame:
    """Transitivity audit of the near-dup clusters: connected
    components merge by CHAINS (A~B, B~C puts A and C in one cluster
    even when A and C are not near-dups), so keep-one-representative
    can silently drop non-duplicate content. Per cluster size: how
    many of each cluster's possible pairs are actually verified
    near-dup pairs — ``completeness`` = Σ verified / Σ possible from
    exact integer sums (1.0 = every cluster is a clique; low values at
    big sizes = chain-merging, the signal to verify-within-cluster
    before dropping).

    Scale shape: x02's pair chain + label propagation (both production
    plans); possible-pair counts come from the cluster-size reduce
    (s·(s−1)/2, integer); verified-pair counts from ONE join of the
    pair list to the cluster map. Output is #distinct-sizes rows.
    """
    pairs = minhash_dedup_pairs(
        docs, text_col=text_col, id_col=id_col, threshold=threshold
    ).select("a", "b").localCheckpoint()
    clusters = dedup_clusters(pairs).localCheckpoint()
    sizes = clusters.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    ca = clusters.select(F.col("node").alias("a"), F.col("cluster_id"))
    # both endpoints of a verified pair are by construction in the same
    # cluster; one join attaches the cluster id
    pc = pairs.join(ca, "a").groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_verified")
    )
    per_cluster = sizes.join(pc, "cluster_id", "left").select(
        "cluster_size",
        F.coalesce("n_verified", F.lit(0)).alias("n_verified"),
        (F.col("cluster_size") * (F.col("cluster_size") - 1) / 2)
        .cast("bigint")
        .alias("n_possible"),
    )
    return (
        per_cluster.groupBy("cluster_size")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_clusters"),
            F.sum("n_verified").cast("bigint").alias("n_verified_pairs"),
            F.sum("n_possible").cast("bigint").alias("n_possible_pairs"),
            F.round(F.sum("n_verified") / F.sum("n_possible"), 4).alias(
                "completeness"
            ),
        )
        .select(
            F.col("cluster_size").cast("bigint").alias("cluster_size"),
            "n_clusters",
            "n_verified_pairs",
            "n_possible_pairs",
            "completeness",
        )
        .orderBy("cluster_size")
    )


def dedup_mixture_shift(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    threshold: float = 0.7,
) -> DataFrame:
    """"Dedup changes your mixture" sheet: per-source token shares
    BEFORE vs AFTER near-dup removal under keep-the-best-representative
    (x97's rule: per cluster argmax (quality, smallest id)). Sources
    whose content is heavily syndicated lose share when dedup lands —
    this is the sheet that says the post-dedup corpus no longer matches
    the mixture weights someone tuned upstream (x21/x64), BEFORE a
    training run discovers it.

    Per source: doc/token counts before and after, token share of the
    corpus before/after (4dp from exact integer sums), and the share
    delta in basis points (difference of the two integer-rounded
    shares — no float subtraction decides the sign).

    Scale shape: x02's pair chain + label propagation; representative
    selection is a partial-aggregable per-cluster min(struct) (never a
    window over members); the kept set is one anti-join + a
    cluster-map-sized union; shares come from a #sources reduce plus
    broadcast 1-row totals.
    """
    from otus_clickhouse_spark.pipeline.text import quality_score, token_count

    pairs = minhash_dedup_pairs(
        docs, text_col=text_col, id_col=id_col, threshold=threshold
    )
    clusters = dedup_clusters(pairs).localCheckpoint()
    base = docs.select(
        F.col(id_col),
        F.col(source_col),
        token_count(F.col(text_col)).alias("__nt"),
        F.round(quality_score(F.col(text_col)) * 10000)
        .cast("bigint")
        .alias("__q4"),
    ).localCheckpoint()
    cq = clusters.join(
        base.select(F.col(id_col).alias("node"), "__q4"), "node"
    )
    reps = (
        cq.groupBy("cluster_id")
        .agg(
            F.min(
                F.struct((-F.col("__q4")).alias("nq"), F.col("node").alias("i"))
            ).alias("__b")
        )
        .select(F.col("__b.i").alias(id_col))
    )
    clustered_ids = clusters.select(F.col("node").alias(id_col))
    kept = base.join(clustered_ids, id_col, "left_anti").select(id_col).union(reps)
    after = base.join(kept, id_col).groupBy(source_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs_after"),
        F.sum("__nt").cast("bigint").alias("tok_after"),
    )
    before = base.groupBy(source_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs_before"),
        F.sum("__nt").cast("bigint").alias("tok_before"),
    )
    tb = before.agg(F.sum("tok_before").alias("__tb"))
    ta = after.agg(F.sum("tok_after").alias("__ta"))
    j = (
        before.join(after, source_col, "left")
        .select(
            source_col,
            "n_docs_before",
            F.coalesce("n_docs_after", F.lit(0)).cast("bigint").alias("n_docs_after"),
            "tok_before",
            F.coalesce("tok_after", F.lit(0)).cast("bigint").alias("tok_after"),
        )
        .crossJoin(F.broadcast(tb))
        .crossJoin(F.broadcast(ta))
    )
    sb_bp = F.round(F.col("tok_before") * 10000.0 / F.col("__tb")).cast("bigint")
    sa_bp = F.round(F.col("tok_after") * 10000.0 / F.col("__ta")).cast("bigint")
    return (
        j.select(
            source_col,
            "n_docs_before",
            "n_docs_after",
            "tok_before",
            "tok_after",
            (sb_bp / 10000.0).alias("share_before"),
            (sa_bp / 10000.0).alias("share_after"),
            (sa_bp - sb_bp).alias("share_delta_bp"),
        )
        .orderBy(source_col)
    )


def kmv_cardinality_audit(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 8,
    bucket_width: int = 20,
) -> DataFrame:
    """K-minimum-value cardinality-sketch accuracy audit: the minhash
    signature the dedup pipeline ALREADY computes doubles as a
    distinct-shingle cardinality sketch — for a min of c uniform draws
    on [0, P), E[min] ≈ P/(c+1), so each permutation yields the
    estimator ĉ_i = P/(mh_i + 1) − 1 and the 8-permutation mean is a
    free per-doc cardinality estimate (Bar-Yossef et al. 2002; the
    deterministic md5-affine twin of CH's uniq sketches, which A4 maps
    to Spark HLL — THIS estimator is engine-portable where HLL
    internals are not, so its error is oracle-checkable). The audit
    reports, per exact-cardinality bucket (width ``bucket_width``
    shingles, capped at decile 9): doc count, mean exact cardinality,
    mean estimate, and the mean absolute relative error in basis
    points — the sheet that says how far the free sketch can be
    trusted (e.g. for skipping exact size joins on tiny docs).

    All error statistics integer-ize at 4dp before summing (the x96
    discipline). One signature aggregation (shared shape with x02) +
    a #buckets reduce; estimates are per-row arithmetic on the
    already-reduced signature table."""
    sh = shingles(docs, text_col, id_col, n)
    sig = minhash_signatures(sh, id_col, num_hashes, with_size=True)
    est = sum(
        (F.lit(float(MINHASH_P)) / (F.col(f"mh{i}") + 1) - 1)
        for i in range(num_hashes)
    ) / F.lit(float(num_hashes))
    est_bp = F.round(est * 10000).cast("bigint")
    err_bp = F.round(
        F.abs(est_bp / 10000.0 - F.col("n_sh")) / F.col("n_sh") * 10000
    ).cast("bigint")
    b = F.least(F.floor(F.col("n_sh") / bucket_width), F.lit(9)).cast("bigint")
    return (
        sig.select(b.alias("card_bucket"), F.col("n_sh"), est_bp.alias("__e"), err_bp.alias("__r"))
        .groupBy("card_bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.round(F.sum("n_sh") / F.count(F.lit(1)), 4).alias("mean_exact"),
            F.round(F.sum("__e") / (F.count(F.lit(1)) * 10000), 4).alias("mean_est"),
            F.round(F.sum("__r") / F.count(F.lit(1)), 1).alias("mean_abs_err_bp"),
        )
        .orderBy("card_bucket")
    )
