"""Streaming training-data ingestion: near-dup detection at arrival time.

The batch pipeline (pipeline/dedup.py) dedups a corpus at rest; a real
ingestion pipeline also needs the streaming half — "is this incoming
document a near-duplicate of anything we already hold?" — the pattern
the reference runs as Kafka → MV → landing (lecture_09.md:891-918,
hw17) applied to the LLM-data use case.

Plan shape (Structured Streaming):
- the per-document minhash signature is computed as a PURE map-side
  expression (``array_min`` over a transformed shingle array — no
  groupBy), so the stream side needs no shuffle and no state store;
- candidates come from a stream-static equi-join against the corpus'
  precomputed band→bucket table. Static side is broadcast when small;
  at 100 TB the bucket table is written bucketed by ``band_key`` so
  each micro-batch probe prunes to matching buckets;
- exact Jaccard verification runs per micro-batch via ``foreachBatch``
  reusing the batch ``jaccard_verify`` operator — micro-batches are
  bounded, so the quadratic step stays bounded regardless of stream
  lifetime. No unbounded streaming state anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from otus_clickhouse_spark.pipeline.dedup import (
    MINHASH_A,
    MINHASH_B,
    MINHASH_P,
    jaccard_verify,
    shingles,
)


def band_keys_expr(
    text_col: str = "text",
    n: int = 3,
    bands: int = 4,
    rows_per_band: int = 2,
) -> Column:
    """``array<string>`` of LSH band keys for one document, computed
    entirely map-side (shingle → md5 → affine-permutation min → banded
    md5), bit-identical to the batch path in pipeline/dedup.py. Being a
    plain expression, it is usable on a streaming DataFrame with no
    shuffle and no state."""
    tokens = F.split(F.col(text_col), " ")
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(tokens) - n, F.lit(0))),
            lambda i: F.array_join(F.slice(tokens, i + 1, n), " "),
        )
    )
    grams = F.filter(grams, lambda g: F.length(g) > 0)
    h = lambda g: F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("bigint")  # noqa: E731

    def perm_min(i: int) -> Column:
        # single-arg lambda: a 2-arg one would make F.transform pass the
        # array index as the second argument
        return F.array_min(
            F.transform(grams, lambda g: (h(g) * F.lit(MINHASH_A[i]) + F.lit(MINHASH_B[i])) % F.lit(MINHASH_P))
        )

    mins = [perm_min(i) for i in range(bands * rows_per_band)]
    return F.array(
        *[
            F.md5(F.concat_ws("|", F.lit(b), *[mins[b * rows_per_band + r] for r in range(rows_per_band)]))
            for b in range(bands)
        ]
    )


def corpus_bucket_table(
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    bands: int = 4,
    rows_per_band: int = 2,
    max_bucket: int | None = None,
) -> DataFrame:
    """Static side of the stream-static join: (corpus_id, band_key).
    Computed once per corpus snapshot; persist it (or at scale, write
    it out bucketed by band_key so micro-batch probes partition-prune).

    ``max_bucket`` (default :data:`~otus_clickhouse_spark.pipeline.
    dedup.LSH_MAX_BUCKET`) caps the per-key INDEX fanout the same way
    the batch generator caps its self-join: a bucket over the cap keeps
    only its min-id representative row, so one degenerate boilerplate
    key cannot make a single incoming doc explode into bucket-size
    candidates. This is a PROBABILISTIC recall trade, not a free one:
    bucket co-membership means one band collision, not near-identity,
    so an incoming doc whose only over-threshold corpus match is a
    dropped (non-representative) member of an over-cap bucket can fail
    the Jaccard verify against the representative and be admitted.
    Mitigations at scale: over-cap buckets are by construction
    boilerplate-dominated (members typically DO verify against each
    other), rep-chaining keeps them reachable via the representative in
    the common case, and a larger cap or more bands recovers recall at
    the standard LSH cost curve. The post-verify recall test
    (tests/test_streaming_ingest.py) pins both directions: a
    representative-similar member still admits correctly, and the
    documented miss case is a REJECTED duplicate slipping through, never
    a false rejection of a novel doc."""
    from otus_clickhouse_spark.pipeline.dedup import LSH_MAX_BUCKET

    cap = LSH_MAX_BUCKET if max_bucket is None else max_bucket
    raw = corpus.select(
        F.col(id_col).alias("corpus_id"),
        F.explode(
            band_keys_expr(text_col, n=n, bands=bands, rows_per_band=rows_per_band)
        ).alias("band_key"),
    )
    deg = raw.groupBy("band_key").agg(
        F.count(F.lit(1)).alias("__deg"), F.min("corpus_id").alias("__rep")
    )
    return (
        raw.join(deg, "band_key")
        .where((F.col("__deg") <= cap) | (F.col("corpus_id") == F.col("__rep")))
        .select("corpus_id", "band_key")
    )


def streaming_neardup_candidates(
    stream: DataFrame,
    buckets: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    bands: int = 4,
    rows_per_band: int = 2,
) -> DataFrame:
    """Append-mode stream: each incoming doc joined to the corpus
    buckets it collides with — (id, corpus_id, band_key). Stateless:
    map-side signature + stream-static inner join."""
    keyed = stream.select(
        F.col(id_col),
        F.explode(
            band_keys_expr(text_col, n=n, bands=bands, rows_per_band=rows_per_band)
        ).alias("band_key"),
    )
    return keyed.join(buckets, "band_key").select(id_col, "corpus_id", "band_key")


def attach_neardup_verify(
    stream: DataFrame,
    corpus: DataFrame,
    path: str,
    checkpoint: str,
    threshold: float = 0.7,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
):
    """Start a streaming query appending verified near-dups to ``path``.

    Per micro-batch (foreachBatch): LSH candidates against the static
    corpus buckets, then exact Jaccard via the batch ``jaccard_verify``
    — output rows are (a=incoming id, b=corpus id, jaccard ≥ threshold).
    The corpus shingle relation and bucket table are computed once and
    persisted across batches.

    Exactly-once sink: foreachBatch is at-least-once (a batch replays
    after a failure), so the write is made idempotent by partitioning
    the landing on the epoch id with DYNAMIC partition overwrite — a
    replayed epoch replaces its own partition instead of appending a
    duplicate copy.
    """
    corpus_sh = shingles(corpus, text_col, id_col, n=n).persist()
    corpus_sizes = corpus_sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh")).persist()
    buckets = corpus_bucket_table(corpus, text_col, id_col, n=n).persist()

    def process(batch: DataFrame, _epoch: int):
        cand = (
            batch.select(
                F.col(id_col), F.explode(band_keys_expr(text_col, n=n)).alias("band_key")
            )
            .join(buckets, "band_key")
            .where(F.col(id_col) != F.col("corpus_id"))
            .select(F.col(id_col).alias("a"), F.col("corpus_id").alias("b"))
            .distinct()
        )
        batch_sh = shingles(batch, text_col, id_col, n=n)
        batch_sizes = batch_sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
        sh = batch_sh.unionByName(corpus_sh)
        sizes = batch_sizes.unionByName(corpus_sizes)
        out = jaccard_verify(cand, sh, id_col=id_col, threshold=threshold, sizes=sizes)
        (
            out.withColumn("_epoch", F.lit(int(_epoch)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_epoch")
            .parquet(path)
        )

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .start()
    )
