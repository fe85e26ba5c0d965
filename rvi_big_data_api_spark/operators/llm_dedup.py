"""Deduplication operators (SURVEY.md §2.10) — the LLM-training-data
extension mandated by BASELINE.json:6, over the `documents` fixture.

Scale design: exact dedup shuffles only (hash, doc_id) pairs, never full
payloads; MinHash/LSH turns the O(N²) near-dup problem into a band-bucket
equi-join whose cost follows true duplicate density. All hashing is seeded
xxhash64 — constant seeds, no rand(), so the driver's re-runs reproduce
bit-identical results (SURVEY.md §4.3 determinism requirement).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..io import load
from ..registry import query

# MinHash/LSH parameters: K = B bands × R rows. Threshold ≈ (1/B)^(1/R) ≈ 0.71
# — candidate pairs are then verified against true Jaccard ≥ JACCARD_TAU.
MINHASH_SEEDS = tuple(range(16))
LSH_BANDS = 4
LSH_ROWS = 4
SHINGLE_N = 5
JACCARD_TAU = 0.5


@query(
    "dedup_exact",
    oracle="""
    SELECT doc_id, lang, source, n_chars
    FROM (
        SELECT *, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        FROM documents
    ) WHERE rn = 1
    """,
    tags=("llm", "dedup"),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup keeping the lowest doc_id per text — a window, NOT
    dropDuplicates (whose keeper is partition-order-dependent). Duplicate
    groups exist only at sf0.1 [F]; at other SFs this is a clean pass-through.
    At 100 TB, partition by a text hash instead of raw text to keep shuffle
    keys small (see dedup_hash)."""
    d = load(spark, sf_dir, "documents")
    w = Window.partitionBy("text").orderBy("doc_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", "source", "n_chars")
    )


@query(
    "dedup_hash",
    oracle="""
    SELECT doc_id, md5(text) AS content_hash
    FROM (
        SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        FROM documents
    ) WHERE rn = 1
    """,
    tags=("llm", "dedup"),
)
def dedup_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-hash dedup — the at-scale variant of dedup_exact: the shuffle
    key is a 16-byte digest, not a multi-KB document, so 100 TB of text
    shuffles ~hash-sized rows."""
    d = load(spark, sf_dir, "documents")
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.md5("text").alias("content_hash"))
    )


def _doc_shingles(docs: DataFrame) -> DataFrame:
    """Distinct (doc_id, shingle) pairs: word 5-grams via pure column exprs
    (sequence + slice + array_join; no Python UDF).

    The token array is materialized ONCE per row before the transform —
    slicing `split(text)` inside the lambda would re-split the document for
    every shingle index (O(words²) per doc)."""
    shingles = F.expr(
        f"transform(sequence(1, greatest(size(toks) - {SHINGLE_N - 1}, 1)),"
        f" i -> array_join(slice(toks, i, {SHINGLE_N}), ' '))"
    )
    return (
        docs.select("doc_id", F.split("text", " ").alias("toks"))
        .select("doc_id", F.explode(shingles).alias("shingle"))
        .distinct()
    )


def minhash_signatures(docs: DataFrame) -> DataFrame:
    """K seeded-permutation MinHash values per doc: min(xxhash64(shingle, seed))
    for each constant seed — one groupBy, K aggregates."""
    sh = _doc_shingles(docs)
    aggs = [
        F.min(F.xxhash64("shingle", F.lit(seed))).alias(f"mh{idx}")
        for idx, seed in enumerate(MINHASH_SEEDS)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


@query("dedup_near", oracle=None, tags=("llm", "dedup", "rows-only"))
def dedup_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs: shingle → MinHash(16) → LSH(4 bands × 4 rows) →
    candidate pairs from band-bucket equi-joins → verified true Jaccard ≥ 0.5.

    Rows-only (seeded xxhash64 has no DuckDB twin), but fully deterministic.
    The banding join is what scales: candidates are generated per (band,
    band_hash) bucket, so cost tracks duplicate density instead of N²; at
    100 TB, buckets with pathological size get salted or capped.
    """
    docs = load(spark, sf_dir, "documents")
    sigs = minhash_signatures(docs)

    # band key = hash of the band's R consecutive signature values
    bands = []
    for b in range(LSH_BANDS):
        cols = [F.col(f"mh{b * LSH_ROWS + r}") for r in range(LSH_ROWS)]
        bands.append(F.struct(F.lit(b).alias("band_idx"), F.xxhash64(*cols).alias("band_hash")))
    banded = sigs.select("doc_id", F.explode(F.array(*bands)).alias("band")).select(
        "doc_id", F.col("band.band_idx").alias("band_idx"), F.col("band.band_hash").alias("band_hash")
    )

    a = banded.alias("a")
    b = banded.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )

    # Verify candidates against true shingle-set Jaccard.
    sh = _doc_shingles(docs)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    sa = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    sb = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    common = (
        candidates.join(sa, "doc_a")
        .join(sb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        common.join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b")), "doc_b")
        .withColumn(
            "jaccard",
            F.round(F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")), 4),
        )
        .filter(F.col("jaccard") >= JACCARD_TAU)
        .select("doc_a", "doc_b", "jaccard")
    )
