"""Similarity-search operators (SURVEY.md §2.10) over the `embeddings`
fixture (array<float> dim=64, L2-normalized [F] → cosine ≡ dot product).

The dot product is a JVM-side higher-order expression (zip_with + aggregate)
— no UDF, no Python round trip; verified bit-identical to DuckDB's
list_dot_product over DOUBLE[] this session, which is what makes the SQL
oracles exact. Scale paths noted per operator.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession, Window

from ..io import load
from ..registry import query

SIM_TOPK_K = 5
SIM_TOPK_NQUERIES = 5
SIM_PAIRS_TAU = 0.28  # labels are NOT similarity clusters in the fixture [F]
SIM_PAIRS_SALT = 8  # per-block fan-out; bounds build-side replication at S×
KNN_K = 10
KNN_NQUERIES = 20


GEMM_CHUNKS = 4  # chunk-pair fan-out per block (task-size bound at scale)


def block_pairs_gemm(e: DataFrame, block_col: str, tau: float) -> DataFrame:
    """All within-block pairs (vec_a < vec_b) with dot ≥ tau, computed as
    chunk-pair GEMMs in Arrow batches — the 100 TB execution shape for
    block-local all-pairs similarity.

    Each vector hashes to one of C chunks inside its block; every unordered
    chunk pair (ci ≤ cj) becomes ONE applyInPandas group whose task runs a
    single numpy matrix multiply between the two chunks' embedding matrices.
    Properties that matter at scale: task input is two chunks (bounded:
    block/C rows each — raise C as blocks grow), parallelism is
    C·(C+1)/2 per block, replication is a bounded C× of the vectors (same
    trade as the salted join in `sim_pairs`), and each unordered pair is
    produced exactly once — pair {u,v} appears only in group
    (min(cu,cv), max(cu,cv)).

    Numerics: the GEMM accumulates in float64 like the sequential
    `dot()` fold but in SIMD order. Measured on the fixtures
    (`scripts/check_gemm_margin.py`, re-run it after any fixture/tau
    change): at sf0.1 the nearest pair sits 1.8e-5 from the tau threshold
    and 1.4e-8 from a 4-dp rounding boundary, while the observed
    summation-reorder error is 0.0 (≤5.6e-17 at sf0.01) — many orders of
    magnitude of margin, so pair membership and 4-dp-rounded outputs are
    stable across fold orders (and deterministic run-to-run: numpy's order
    is fixed for a given shape)."""
    import numpy as np
    import pandas as pd

    C = GEMM_CHUNKS
    blk_type = next(f.dataType.simpleString() for f in e.schema.fields if f.name == block_col)
    entries = F.array(
        *[
            F.struct(
                F.least(F.col("ck"), F.lit(j)).alias("ci"),
                F.greatest(F.col("ck"), F.lit(j)).alias("cj"),
            )
            for j in range(C)
        ]
    )
    rep = (
        e.select(
            F.col(block_col).alias("blk"),
            "vec_id",
            "embedding",
            F.pmod(F.xxhash64("vec_id"), F.lit(C)).alias("ck"),
        )
        .select("blk", "vec_id", "embedding", "ck", F.explode(entries).alias("cp"))
        .select("blk", "vec_id", "embedding", "ck", F.col("cp.ci"), F.col("cp.cj"))
    )

    empty = pd.DataFrame({"blk": [], "vec_a": [], "vec_b": [], "raw_dot": []})

    def gemm(pdf: pd.DataFrame) -> pd.DataFrame:
        ci, cj = pdf["ci"].iloc[0], pdf["cj"].iloc[0]
        a = pdf[pdf["ck"] == ci]
        if a.empty or (ci != cj and pdf[pdf["ck"] == cj].empty):
            return empty  # a block missing one chunk of the pair
        ids_a = a["vec_id"].to_numpy()
        Ma = np.stack(a["embedding"].to_numpy()).astype(np.float64)
        if ci == cj:
            G = Ma @ Ma.T
            ia, ib = np.nonzero(G >= tau)
            keep = ids_a[ia] < ids_a[ib]
            va, vb, d = ids_a[ia[keep]], ids_a[ib[keep]], G[ia[keep], ib[keep]]
        else:
            b = pdf[pdf["ck"] == cj]
            ids_b = b["vec_id"].to_numpy()
            Mb = np.stack(b["embedding"].to_numpy()).astype(np.float64)
            G = Ma @ Mb.T
            ia, ib = np.nonzero(G >= tau)
            u, v, d = ids_a[ia], ids_b[ib], G[ia, ib]
            va, vb = np.minimum(u, v), np.maximum(u, v)
        return pd.DataFrame(
            {"blk": pdf["blk"].iloc[0], "vec_a": va, "vec_b": vb, "raw_dot": d}
        )

    return rep.groupBy("blk", "ci", "cj").applyInPandas(
        gemm, schema=f"blk {blk_type}, vec_a bigint, vec_b bigint, raw_dot double"
    )


def dot(a: Column, b: Column) -> Column:
    """Cosine similarity for unit vectors: elementwise product folded in
    double precision (identical fold order — and bit-identical results — to
    DuckDB's list_dot_product over DOUBLE[]). Casting inside the single
    zip_with avoids materializing two intermediate double arrays per row."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


# ---------------------------------------------------------------------------
# Session-scoped memos of the two shared graph subtrees (VERDICT r6 item 2 —
# the `gram_cc_labels` pattern from llm_dedup.py applied to the similarity
# graph family). Eight graph ops consume the SAME τ-thresholded pair list
# (block_pairs_gemm at SIM_PAIRS_TAU) and two consume the SAME mutual-kNN
# edge list; per-op construction meant the expensive Arrow GEMM / rank-window
# subtree re-ran once per consumer in a full-registry drive, which is the
# contention mode behind BENCH_r06's 2-4× swings on graph_kcore /
# graph_label_propagation / knn_graph_mutual. Keyed by (applicationId,
# sf_dir): a new session never sees another session's frames. Values are
# EAGERLY CHECKPOINTED edge frames — disk-backed, plan-truncated, edge-list-
# sized (not corpus-sized), so every consumer's plan starts from a cheap
# checkpoint scan and the GEMM job runs ONCE per process.
#
# Numerics note (ADVICE r6): pair MEMBERSHIP here comes from the GEMM's
# SIMD-order dots while the oracles threshold on DuckDB's exact
# list_dot_product fold. The measured fixture margin (nearest pair 1.8e-5
# from SIM_PAIRS_TAU vs observed reorder error ≤5.6e-17 — see
# block_pairs_gemm's docstring) makes membership fold-order-stable; re-run
# scripts/check_gemm_margin.py whenever fixtures or SIM_PAIRS_TAU change.
# ---------------------------------------------------------------------------
_SIM_PAIR_EDGES: dict[tuple[str, str], DataFrame] = {}
_MUTUAL_KNN_EDGES: dict[tuple[str, str], DataFrame] = {}


def sim_pair_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checkpointed (label, vec_a, vec_b) pair list at SIM_PAIRS_TAU
    (vec_a < vec_b), computed once per (session, sf_dir). Shared by
    graph_pagerank / graph_triangle_count / graph_kcore /
    graph_jaccard_neighbors / graph_bfs_distance / graph_closeness /
    graph_clustering_coefficient / graph_assortativity. sim_pairs_gemm does
    NOT share — it is the oracled conformance query for the GEMM itself and
    must pay (and measure) its own subtree."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _SIM_PAIR_EDGES:
        from ..session import ensure_checkpoint_dir

        ensure_checkpoint_dir(spark)
        e = load(spark, sf_dir, "embeddings")
        _SIM_PAIR_EDGES[key] = (
            block_pairs_gemm(e, "label", SIM_PAIRS_TAU)
            .select(F.col("blk").alias("label"), "vec_a", "vec_b")
            .checkpoint(eager=True)
        )
    return _SIM_PAIR_EDGES[key]


def mutual_knn_edge_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checkpointed directed mutual-kNN edge list (src, dst, dot), computed
    once per (session, sf_dir). Shared by knn_graph_mutual and
    graph_label_propagation (whose two vote rounds previously re-consumed
    the bucketed-candidates subtree via ReusedExchange — correct, but its
    cold cost landed on whichever consumer a bench run timed first)."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _MUTUAL_KNN_EDGES:
        from ..session import ensure_checkpoint_dir

        ensure_checkpoint_dir(spark)
        e = load(spark, sf_dir, "embeddings")
        _MUTUAL_KNN_EDGES[key] = mutual_knn_edges(e).checkpoint(eager=True)
    return _MUTUAL_KNN_EDGES[key]


@query(
    "sim_topk",
    oracle=f"""
    SELECT qid, vec_id, dot, rank FROM (
        SELECT q.vec_id AS qid, e.vec_id,
               round(list_dot_product(q.embedding::DOUBLE[], e.embedding::DOUBLE[]), 4) AS dot,
               row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY list_dot_product(q.embedding::DOUBLE[], e.embedding::DOUBLE[]) DESC,
                            e.vec_id ASC) AS rank
        FROM embeddings q JOIN embeddings e ON e.vec_id != q.vec_id
        WHERE q.vec_id < {SIM_TOPK_NQUERIES}
    ) WHERE rank <= {SIM_TOPK_K}
    """,
    tags=("llm", "similarity"),
)
def sim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: broadcast the Q query vectors against the
    corpus, score JVM-side, rank-window per query.

    100 TB path: the corpus side stays partitioned and is scanned ONCE per
    batch of queries (broadcast keeps it shuffle-free); for large Q switch to
    the LSH/IVF-blocked variant (bucket on coarse signature, join within
    bucket) — same skeleton as sim_pairs."""
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < SIM_TOPK_NQUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("q_emb")
    )
    scored = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", dot(F.col("q_emb"), F.col("embedding")).alias("raw_dot"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("raw_dot").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= SIM_TOPK_K)
        .select("qid", "vec_id", F.round("raw_dot", 4).alias("dot"), "rank")
    )


@query(
    "sim_hard_negatives",
    oracle=f"""
    SELECT qid, vec_id, dot, rank FROM (
        SELECT q.vec_id AS qid, e.vec_id,
               round(list_dot_product(q.embedding::DOUBLE[], e.embedding::DOUBLE[]), 4) AS dot,
               row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY list_dot_product(q.embedding::DOUBLE[], e.embedding::DOUBLE[]) DESC,
                            e.vec_id ASC) AS rank
        FROM embeddings q JOIN embeddings e ON e.label != q.label
        WHERE q.vec_id < {SIM_TOPK_NQUERIES}
    ) WHERE rank <= {SIM_TOPK_K}
    """,
    tags=("llm", "similarity", "training"),
)
def sim_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining — for each anchor, the top-k most-similar
    vectors with a DIFFERENT label: the contrastive-training companion of
    sim_topk (whose neighbors are candidate positives). Random negatives
    are trivially easy and teach an embedding model nothing; the negatives
    that move the loss are the near-misses this query surfaces — highest
    cosine across the label boundary. The mined (anchor, hard-negative,
    margin) triples feed triplet/InfoNCE batches directly.

    Same execution skeleton as sim_topk — anchors broadcast, corpus
    scanned once shuffle-free, rank window per anchor — with the label
    inequality as the only extra predicate (a map-side filter, no new
    shuffle). At 100 TB: anchors batch like sim_topk's queries, and the
    exhaustive scan swaps for the ANN shortlist (sim_topk_ann /
    sim_adc_topk) re-filtered by label, the standard two-stage miner."""
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < SIM_TOPK_NQUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("q_emb"),
        F.col("label").alias("q_label"),
    )
    scored = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("label") != F.col("q_label"))
        .select("qid", "vec_id", dot(F.col("q_emb"), F.col("embedding")).alias("raw_dot"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("raw_dot").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= SIM_TOPK_K)
        .select("qid", "vec_id", F.round("raw_dot", 4).alias("dot"), "rank")
    )


@query(
    "sim_pairs",
    oracle=f"""
    SELECT a.label, a.vec_id AS vec_a, b.vec_id AS vec_b,
           round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) AS cosine
    FROM embeddings a
    JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= {SIM_PAIRS_TAU}
    """,
    tags=("llm", "similarity"),
)
def sim_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All similar pairs (cosine ≥ τ) within label blocks — dedup-by-
    similarity. Blocking bounds the join: each task compares only within its
    block, so cost is Σ block² rather than N²; at 100 TB blocks come from an
    LSH bucket or quantized-centroid key instead of a given label.

    Scale design (VERDICT r1 item 3): the block key has only ~10 distinct
    values, so a plain shuffled equi-join would serialize each block onto one
    task — and broadcasting the whole corpus (round 1's answer) caps out at
    driver/executor memory. Instead, SALT the probe side deterministically
    (vec_id % S) and replicate the build side S ways; the join key becomes
    (label, salt), splitting every block across S tasks. Replication cost is
    a bounded S× of the build side — the classic skew-join trade — and each
    pair is produced exactly once (in the partition owning a.vec_id % S).
    Broadcast remains the right fast path when the build side is provably
    small; callers with that knowledge can join with F.broadcast directly
    (pattern proven in tests/test_scale.py's salted-join demo)."""
    e = load(spark, sf_dir, "embeddings")
    a = e.withColumn("salt", F.pmod(F.col("vec_id"), F.lit(SIM_PAIRS_SALT))).alias("a")
    b = (
        e.withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(SIM_PAIRS_SALT - 1))))
        .alias("b")
    )
    d = dot(F.col("a.embedding"), F.col("b.embedding"))
    return (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.salt") == F.col("b.rep"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.label").alias("label"),
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            d.alias("raw_dot"),
        )
        .filter(F.col("raw_dot") >= SIM_PAIRS_TAU)
        .select("label", "vec_a", "vec_b", F.round("raw_dot", 4).alias("cosine"))
    )


@query(
    "sim_pairs_gemm",
    oracle=f"""
    SELECT a.label, a.vec_id AS vec_a, b.vec_id AS vec_b,
           round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) AS cosine
    FROM embeddings a
    JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= {SIM_PAIRS_TAU}
    """,
    tags=("llm", "similarity"),
)
def sim_pairs_gemm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`sim_pairs` re-executed as chunk-pair GEMMs (block_pairs_gemm) — the
    Arrow/vectorized twin of the JVM higher-order-function formulation,
    hash-checked against the SAME oracle.

    Why both exist: the HOF fold is whole-stage-codegen-friendly and
    bit-identical to the DuckDB twin; the GEMM path moves the O(block²·d)
    inner loop into numpy matrix multiplies (one Arrow batch per chunk
    pair), which wins once blocks are large — measured ~3× at sf0.1 — and
    is the shape a 100 TB all-pairs pass should take. Margin analysis for
    the fold-order difference lives on block_pairs_gemm."""
    e = load(spark, sf_dir, "embeddings")
    return (
        block_pairs_gemm(e, "label", SIM_PAIRS_TAU)
        .select(
            F.col("blk").alias("label"),
            "vec_a",
            "vec_b",
            F.round("raw_dot", 4).alias("cosine"),
        )
    )


@query(
    "knn_label",
    oracle=f"""
    WITH scored AS (
        SELECT q.vec_id AS qid, e.label,
               row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY list_dot_product(q.embedding::DOUBLE[], e.embedding::DOUBLE[]) DESC,
                            e.vec_id ASC) AS rank
        FROM embeddings q JOIN embeddings e ON e.vec_id >= {KNN_NQUERIES}
        WHERE q.vec_id < {KNN_NQUERIES}
    ),
    votes AS (
        SELECT qid, label, count(*)::BIGINT AS n_votes
        FROM scored WHERE rank <= {KNN_K}
        GROUP BY qid, label
    )
    SELECT qid, label AS predicted_label, n_votes FROM (
        SELECT *, row_number() OVER (PARTITION BY qid
                                     ORDER BY n_votes DESC, label ASC) AS vr
        FROM votes
    ) WHERE vr = 1
    """,
    tags=("llm", "similarity"),
)
def knn_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classification-by-retrieval: majority label among the k nearest
    neighbors. Majority via count + rank (not mode()) so ties break
    deterministically toward the smaller label in both engines."""
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < KNN_NQUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("q_emb")
    )
    corpus = e.filter(F.col("vec_id") >= KNN_NQUERIES)
    w = Window.partitionBy("qid").orderBy(F.col("raw_dot").desc(), F.col("vec_id").asc())
    neighbors = (
        corpus.crossJoin(F.broadcast(q))
        .select("qid", "vec_id", "label", dot(F.col("q_emb"), F.col("embedding")).alias("raw_dot"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= KNN_K)
    )
    votes = neighbors.groupBy("qid", "label").agg(F.count(F.lit(1)).alias("n_votes"))
    wv = Window.partitionBy("qid").orderBy(F.col("n_votes").desc(), F.col("label").asc())
    return (
        votes.withColumn("vr", F.row_number().over(wv))
        .filter(F.col("vr") == 1)
        .select("qid", F.col("label").alias("predicted_label"), "n_votes")
    )


@query(
    "multimodal_struct",
    oracle="""
    SELECT d.doc_id,
           length(d.text)     AS text_len,
           len(e.embedding)   AS emb_dim,
           e.label,
           round(e.embedding[1], 6) AS first_dim
    FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    """,
    tags=("llm", "multimodal"),
)
def multimodal_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal-column round trip: join text + embedding into one struct
    column, then project typed fields back out — the pattern for carrying
    {text, image_bytes, embedding} rows through a pipeline as one column."""
    d = load(spark, sf_dir, "documents")
    e = load(spark, sf_dir, "embeddings")
    combined = d.join(e, d.doc_id == e.vec_id).select(
        "doc_id", F.struct("text", "embedding", "label").alias("mm")
    )
    return combined.select(
        "doc_id",
        F.length(F.col("mm.text")).alias("text_len"),
        F.size(F.col("mm.embedding")).alias("emb_dim"),
        F.col("mm.label").alias("label"),
        F.round(F.element_at(F.col("mm.embedding"), 1), 6).alias("first_dim"),
    )


IVF_SIGN_BITS = 4  # 2^4 = 16 coarse buckets over the first 4 dimensions

# Corpus-sized bucketing (VERDICT r7 item 3): per-bucket candidate cost is
# quadratic in bucket population, so bucket COUNT must grow with the corpus.
# target rows/bucket below makes total candidate pairs ~N*target/2 — linear
# in N — instead of the measured per-decade cliffs of any fixed width
# (SCALE.md: 4-bit dedup_embed 107x at 10x; mutual-kNN memo build 173 s).
EMBED_TARGET_BUCKET_ROWS = 64
EMBED_MAX_SIGN_BITS = 16  # fixture dim is 64; 2^16 buckets is plenty of spread


def adaptive_bucket_duck_ctes(table: str = "embeddings") -> str:
    """DuckDB CTE pair mirroring ``with_adaptive_bucket`` exactly: n_bits =
    clamp(4, 16, bitlength(ceil(N / target) - 1)) — pure INTEGER arithmetic
    (ceil-div then binary-string length), deliberately not float log2, so a
    near-power-of-two N can never round differently across engines."""
    return f"""
    params AS (
        SELECT greatest({IVF_SIGN_BITS}, least({EMBED_MAX_SIGN_BITS},
                   length(bin((count(*) + {EMBED_TARGET_BUCKET_ROWS - 1})
                              // {EMBED_TARGET_BUCKET_ROWS} - 1))))::INT AS n_bits
        FROM {table}
    ),
    bucketed AS (
        SELECT vec_id, embedding,
               list_sum(list_transform(range(0, (SELECT n_bits FROM params)),
                   i -> CASE WHEN embedding[i + 1] > 0
                             THEN (1::BIGINT << i) ELSE 0 END))::BIGINT AS bucket
        FROM {table}
    )"""


def with_adaptive_bucket(e: DataFrame) -> DataFrame:
    """Attach a sign-bit ``bucket`` column whose WIDTH adapts to the corpus:
    n_bits = clamp(4, 16, bitlength(ceil(N / {EMBED_TARGET_BUCKET_ROWS}) - 1)),
    i.e. the smallest k with 2^k buckets >= N / target-rows-per-bucket — the
    ``n_bits ≈ log2(N / target_bucket_rows)`` sizing rule made the DEFAULT
    rather than a caller knob (VERDICT r7 item 3). Fully declarative: the
    count folds to a 1-row frame that broadcast-joins onto the scan (no
    driver-side action), and the bucket is a JVM-side bit fold over the
    first n_bits dimensions. bitlength-of-(m-1) is integer arithmetic in
    both engines (length(bin(m-1))) — no float log2 near power-of-two
    corpus sizes. ``adaptive_bucket_duck_ctes`` is the oracle twin."""
    cnt = F.count(F.lit(1))
    m = F.floor((cnt + F.lit(EMBED_TARGET_BUCKET_ROWS - 1)) / F.lit(EMBED_TARGET_BUCKET_ROWS)).cast("long")
    params = e.agg(
        F.greatest(
            F.lit(IVF_SIGN_BITS),
            F.least(F.lit(EMBED_MAX_SIGN_BITS), F.length(F.bin(m - 1))),
        ).alias("n_bits")
    )
    return (
        e.crossJoin(F.broadcast(params))
        .withColumn(
            "bucket",
            F.expr(
                "aggregate(transform(sequence(0, n_bits - 1),"
                " i -> IF(element_at(embedding, i + 1) > 0,"
                " shiftleft(cast(1 as bigint), i), cast(0 as bigint))),"
                " cast(0 as bigint), (acc, x) -> acc + x)"
            ),
        )
        .drop("n_bits")
    )


def signbit_bucket(emb: Column, n_bits: int = IVF_SIGN_BITS) -> Column:
    """Coarse quantization without k-means: bucket id = sign bits of the
    first ``n_bits`` dimensions (SURVEY.md §4.3's 'k-means-free'
    pre-partitioning). Deterministic, computable in both dialects.

    ``n_bits`` is the SCALE knob: candidate-pair cost inside a bucket is
    quadratic in bucket size, so a fixed width hits a measured cliff as the
    corpus grows (SCALE.md "Measured 10x sweep": 4-bit buckets made
    dedup_embed_cluster 19x at 10x data). Production sizing is
    ``n_bits ≈ log2(N / target_bucket_rows)`` — grow the bucket count with
    the corpus so per-bucket rows stay constant; the oracled fixture ops pin
    the 4-bit default so DuckDB twins stay expressible."""
    bits = [
        (F.element_at(emb, i + 1) > 0).cast("int") * (2**i) for i in range(n_bits)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


@query(
    "sim_topk_ann",
    oracle=f"""
    WITH bucketed AS (
        SELECT vec_id, label, embedding,
               ((embedding[1] > 0)::INT * 1 + (embedding[2] > 0)::INT * 2
                + (embedding[3] > 0)::INT * 4 + (embedding[4] > 0)::INT * 8) AS bucket
        FROM embeddings
    )
    SELECT qid, vec_id, dot, rank FROM (
        SELECT q.vec_id AS qid, e.vec_id,
               round(list_dot_product(q.embedding::DOUBLE[], e.embedding::DOUBLE[]), 4) AS dot,
               row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY list_dot_product(q.embedding::DOUBLE[], e.embedding::DOUBLE[]) DESC,
                            e.vec_id ASC) AS rank
        FROM bucketed q JOIN bucketed e
          ON q.bucket = e.bucket AND e.vec_id != q.vec_id
        WHERE q.vec_id < {SIM_TOPK_NQUERIES}
    ) WHERE rank <= {SIM_TOPK_K}
    """,
    tags=("llm", "similarity"),
)
def sim_topk_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k — the 100 TB scale path for sim_topk: both sides are
    bucketed by a sign-bit coarse quantizer (IVF-style, k-means-free) and the
    search runs WITHIN the query's bucket only. Cost drops from O(N·Q) to
    O(Q·N/2^bits); recall is what's traded (tests/test_properties.py
    measures it against the exact operator). Same output shape as sim_topk,
    so callers can swap exact↔approximate."""
    e = load(spark, sf_dir, "embeddings").withColumn("bucket", signbit_bucket(F.col("embedding")))
    q = e.filter(F.col("vec_id") < SIM_TOPK_NQUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("q_emb"), F.col("bucket").alias("q_bucket")
    )
    scored = (
        e.join(F.broadcast(q), (F.col("bucket") == F.col("q_bucket")) & (F.col("vec_id") != F.col("qid")))
        .select("qid", "vec_id", dot(F.col("q_emb"), F.col("embedding")).alias("raw_dot"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("raw_dot").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= SIM_TOPK_K)
        .select("qid", "vec_id", F.round("raw_dot", 4).alias("dot"), "rank")
    )


def _centroid_of(assigned: DataFrame, key: str) -> DataFrame:
    """Elementwise mean embedding per `key`: posexplode → (key, pos) partial
    avg → reassemble ordered by pos. Two narrow aggs; the (key, pos) partial
    absorbs the vector volume map-side, so the shuffle carries K×64 rows."""
    return (
        assigned.select(key, F.posexplode("embedding").alias("pos", "v"))
        .groupBy(key, "pos")
        .agg(F.avg(F.col("v").cast("double")).alias("m"))
        .groupBy(key)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
            ).alias("centroid")
        )
    )


# DuckDB twin fragment: elementwise mean per cluster via zipped unnests
# (unnest(embedding) and unnest(range(len))) advance in lockstep).
_DUCK_CENTROID = """
        SELECT {key}, list(m ORDER BY i) AS centroid FROM (
            SELECT {key}, i, avg(v) AS m
            FROM (SELECT {key}, unnest(embedding)::DOUBLE AS v,
                         unnest(range(len(embedding))) AS i FROM {src})
            GROUP BY {key}, i)
        GROUP BY {key}
"""


@query(
    "embed_centroids",
    oracle=f"""
    WITH cent AS ({_DUCK_CENTROID.format(key="label", src="embeddings")}),
    cent_n AS (
        SELECT label, centroid,
               sqrt(list_dot_product(centroid, centroid)) AS norm
        FROM cent
    )
    SELECT e.label AS label,
           count(*)::BIGINT AS n_vecs,
           round(any_value(c.norm), 4) AS centroid_norm,
           round(avg(list_dot_product(c.centroid, e.embedding::DOUBLE[]) / c.norm), 4)
               AS avg_cos_to_centroid
    FROM embeddings e JOIN cent_n c ON e.label = c.label
    GROUP BY e.label
    """,
    tags=("llm", "similarity"),
)
def embed_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group mean embedding + cohesion profile: centroid norm (how
    concentrated the group is on the unit sphere — 1.0 = all identical, →0 =
    isotropic) and the mean cosine of members to their centroid. The
    embedding-space analogue of text_stats, and the building block under
    sim_ivf_kmeans.

    Scale shape: the centroid reduction is the (key, pos) partial-agg pattern
    (_centroid_of) — vector volume collapses map-side; the K-row centroid
    table broadcasts back onto the corpus for the cohesion pass."""
    e = load(spark, sf_dir, "embeddings")
    cent = _centroid_of(e, "label")
    norm = F.sqrt(dot_d(F.col("centroid"), F.col("centroid")))
    return (
        e.join(F.broadcast(cent), "label")
        .select(
            "label",
            norm.alias("norm_raw"),
            (dot_d(F.col("centroid"), F.col("embedding").cast("array<double>")) / norm).alias(
                "cos_raw"
            ),
        )
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.first("norm_raw"), 4).alias("centroid_norm"),
            F.round(F.avg("cos_raw"), 4).alias("avg_cos_to_centroid"),
        )
    )


def dot_d(a: Column, b: Column) -> Column:
    """dot() over already-double arrays (no per-element cast)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


KMEANS_K = 8
KMEANS_ITERS = 2  # unrolled: init → assign → recompute → assign → profile


def _assign(e: DataFrame, cent: DataFrame) -> DataFrame:
    """Nearest-centroid assignment on the unit sphere (argmax dot, ties to
    the lower cluster id): corpus × broadcast(K centroids) → rank window per
    vec_id."""
    w = Window.partitionBy("vec_id").orderBy(F.col("d").desc(), F.col("cluster").asc())
    return (
        e.crossJoin(F.broadcast(cent))
        .select(
            "vec_id",
            "embedding",
            "cluster",
            dot_d(F.col("centroid"), F.col("embedding").cast("array<double>")).alias("d"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "embedding", "cluster")
    )


_DUCK_ASSIGN = """
        SELECT vec_id, embedding, cluster FROM (
            SELECT e.vec_id, e.embedding, c.cluster,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY list_dot_product(c.centroid, e.embedding::DOUBLE[]) DESC,
                                c.cluster ASC) AS rn
            FROM embeddings e CROSS JOIN {cent} c) WHERE rn = 1
"""


@query(
    "sim_ivf_kmeans",
    oracle=f"""
    WITH init AS (
        SELECT vec_id::INT AS cluster, embedding::DOUBLE[] AS centroid
        FROM embeddings WHERE vec_id < {KMEANS_K}
    ),
    a1 AS ({_DUCK_ASSIGN.format(cent="init")}),
    c1 AS ({_DUCK_CENTROID.format(key="cluster", src="a1")}),
    a2 AS ({_DUCK_ASSIGN.format(cent="c1")})
    SELECT a2.cluster AS cluster,
           count(*)::BIGINT AS n_vecs,
           round(avg(list_dot_product(c1.centroid, a2.embedding::DOUBLE[])
                     / sqrt(list_dot_product(c1.centroid, c1.centroid))), 4)
               AS avg_cos_to_centroid
    FROM a2 JOIN c1 ON a2.cluster = c1.cluster
    GROUP BY a2.cluster
    """,
    tags=("llm", "similarity"),
)
def sim_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse quantizer trained by spherical k-means, UNROLLED to a fixed
    KMEANS_ITERS assignments (init = first K vectors → assign → recompute
    centroids → reassign → cluster profile) so the whole computation is one
    deterministic declarative plan with an exact SQL twin — the learned
    upgrade of sim_topk_ann's sign-bit buckets.

    Per iteration: corpus × broadcast(K centroids) scoring (map-only),
    rank-window argmax on vec_id (one shuffle, high-cardinality key), then
    the (cluster, pos) partial-agg centroid reduction — nothing ever
    shuffles the corpus on the K-valued cluster key. Production runs more
    iterations by looping the same two steps with a localCheckpoint every
    few rounds (SCALE.md); ties break to the lower cluster id in both
    engines."""
    e = load(spark, sf_dir, "embeddings")
    cent = (
        e.filter(F.col("vec_id") < KMEANS_K)
        .select(
            F.col("vec_id").cast("int").alias("cluster"),
            F.col("embedding").cast("array<double>").alias("centroid"),
        )
    )
    assigned = _assign(e, cent)
    for _ in range(KMEANS_ITERS - 1):
        cent = _centroid_of(assigned, "cluster")
        assigned = _assign(e, cent)
    norm = F.sqrt(dot_d(F.col("centroid"), F.col("centroid")))
    return (
        assigned.join(F.broadcast(cent), "cluster")
        .select(
            "cluster",
            (dot_d(F.col("centroid"), F.col("embedding").cast("array<double>")) / norm).alias(
                "cos_raw"
            ),
        )
        .groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.avg("cos_raw"), 4).alias("avg_cos_to_centroid"),
        )
    )


PAGERANK_DAMPING = 0.85
PAGERANK_ITERS = 2

# Twin fragment: the sim_pairs edge list (unrounded), symmetrized.
_DUCK_PR_EDGES = f"""
    pairs AS (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
        FROM embeddings a
        JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
              >= {SIM_PAIRS_TAU}
    ),
    edges AS (SELECT vec_a AS src, vec_b AS dst FROM pairs
              UNION ALL SELECT vec_b, vec_a FROM pairs),
    deg AS (SELECT src, count(*)::BIGINT AS outdeg FROM edges GROUP BY src),
    n AS (SELECT count(*)::DOUBLE AS n FROM deg)
"""

_DUCK_PR_STEP = """
    {next} AS (
        SELECT e.dst AS id,
               0.15 / max(nn.n) + {damping} * sum(p.pr / d.outdeg) AS pr
        FROM edges e
        JOIN {prev} p ON e.src = p.id
        JOIN deg d ON e.src = d.src
        CROSS JOIN n nn
        GROUP BY e.dst
    )
"""


@query(
    "graph_pagerank",
    oracle=f"""
    WITH {_DUCK_PR_EDGES},
    pr0 AS (SELECT src AS id, 1.0 / n.n AS pr FROM deg CROSS JOIN n),
    {_DUCK_PR_STEP.format(next="pr1", prev="pr0", damping=PAGERANK_DAMPING)},
    {_DUCK_PR_STEP.format(next="pr2", prev="pr1", damping=PAGERANK_DAMPING)}
    SELECT id AS vec_id, round(pr, 6) AS pagerank FROM pr2
    """,
    tags=("llm", "graph"),
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the similarity graph (sim_pairs' edges, symmetrized) —
    the third iterative-algorithm family after connected components
    (dedup_cluster) and k-means (sim_ivf_kmeans): centrality identifies the
    REPRESENTATIVE document of each near-dup neighborhood (keep the hub,
    drop the satellites — a smarter keeper rule than min-id).

    PAGERANK_ITERS power iterations UNROLLED into one declarative plan:
    each step is edges ⋈ ranks (shuffle on src) → groupBy dst with a
    partial-agg sum — one shuffle per iteration, never materializing an
    N×N matrix. The degree table and node count are tiny broadcasts. The
    twin is the same unrolled chain as CTEs. Production iterates the same
    step to convergence with a localCheckpoint every few rounds; no
    dangling-node term is needed because the symmetrized graph has
    outdeg ≥ 1 everywhere."""
    # Edge detection via the chunk-pair GEMM path, through the session memo
    # (sim_pair_edges — checkpointed once per process): the oracle depends
    # only on pair MEMBERSHIP (dot >= tau), which the measured 1.8e-5 tau
    # margin makes immune to GEMM-vs-fold summation order. The memo's eager
    # fs checkpoint truncates the plan, so deg.count(), every iteration, AND
    # the final read all start from a cheap checkpoint scan instead of
    # re-running the pairs job once per consumer.
    pairs = sim_pair_edges(spark, sf_dir).select("vec_a", "vec_b")
    edges = pairs.select(F.col("vec_a").alias("src"), F.col("vec_b").alias("dst")).unionByName(
        pairs.select(F.col("vec_b").alias("src"), F.col("vec_a").alias("dst"))
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    n_nodes = deg.count()  # scalar: one job over the checkpointed edges
    ranks = deg.select(F.col("src").alias("id"), F.lit(1.0 / n_nodes).alias("pr"))
    for _ in range(PAGERANK_ITERS):
        contrib = (
            edges.join(ranks, edges.src == ranks.id)
            .join(F.broadcast(deg), "src")
            .select("dst", (F.col("pr") / F.col("outdeg")).alias("share"))
        )
        ranks = contrib.groupBy(F.col("dst").alias("id")).agg(
            (F.lit(0.15 / n_nodes) + PAGERANK_DAMPING * F.sum("share")).alias("pr")
        )
    return ranks.select(F.col("id").alias("vec_id"), F.round("pr", 6).alias("pagerank"))


RERANK_CANDIDATES = 20  # stage-1 recall depth
RERANK_K = 5            # stage-2 emitted depth


@query(
    "sim_rerank",
    oracle=f"""
    WITH bucketed AS (
        SELECT vec_id, embedding,
               ((embedding[1] > 0)::INT * 1 + (embedding[2] > 0)::INT * 2
                + (embedding[3] > 0)::INT * 4 + (embedding[4] > 0)::INT * 8) AS bucket
        FROM embeddings
    ),
    stage1 AS (
        SELECT qid, vec_id, dot FROM (
            SELECT q.vec_id AS qid, e.vec_id,
                   list_dot_product(q.embedding::DOUBLE[], e.embedding::DOUBLE[]) AS dot,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY list_dot_product(q.embedding::DOUBLE[],
                                                 e.embedding::DOUBLE[]) DESC,
                                e.vec_id ASC) AS r1
            FROM bucketed q JOIN bucketed e
              ON q.bucket = e.bucket AND e.vec_id != q.vec_id
            WHERE q.vec_id < {SIM_TOPK_NQUERIES}
        ) WHERE r1 <= {RERANK_CANDIDATES}
    )
    SELECT qid, vec_id, round(dot, 4) AS dot, rank FROM (
        SELECT qid, vec_id, dot,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY dot DESC, vec_id ASC) AS rank
        FROM stage1
    ) WHERE rank <= {RERANK_K}
    """,
    tags=("llm", "similarity"),
)
def sim_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieval — the production shape of every vector search:
    stage 1 recalls RERANK_CANDIDATES within the coarse quantizer bucket
    (cheap, approximate), stage 2 reranks the candidate set exactly and
    emits the top RERANK_K. Here both stages use the true dot product (the
    fixture has no cheap/expensive score split), so the contract under test
    is the CANDIDATE-SET THEN RERANK plumbing: stage 2 never touches the
    corpus, only the Q×RERANK_CANDIDATES candidate rows.

    At 100 TB: stage 1 is the IVF/LSH bucket probe (sim_topk_ann /
    sim_ivf_kmeans's quantizer), stage 2 re-scores candidates against the
    full-precision vectors — a join of the tiny candidate list back to the
    corpus by id, broadcast the candidates."""
    e = load(spark, sf_dir, "embeddings").withColumn("bucket", signbit_bucket(F.col("embedding")))
    q = e.filter(F.col("vec_id") < SIM_TOPK_NQUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("q_emb"),
        F.col("bucket").alias("q_bucket"),
    )
    w1 = Window.partitionBy("qid").orderBy(F.col("raw_dot").desc(), F.col("vec_id").asc())
    stage1 = (
        e.join(F.broadcast(q), (F.col("bucket") == F.col("q_bucket")) & (F.col("vec_id") != F.col("qid")))
        .select("qid", "vec_id", dot(F.col("q_emb"), F.col("embedding")).alias("raw_dot"))
        .withColumn("r1", F.row_number().over(w1))
        .filter(F.col("r1") <= RERANK_CANDIDATES)
    )
    w2 = Window.partitionBy("qid").orderBy(F.col("raw_dot").desc(), F.col("vec_id").asc())
    return (
        stage1.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= RERANK_K)
        .select("qid", "vec_id", F.round("raw_dot", 4).alias("dot"), "rank")
    )


@query(
    "graph_triangle_count",
    oracle=f"""
    WITH pairs AS (
        SELECT a.label AS label, a.vec_id AS vec_a, b.vec_id AS vec_b
        FROM embeddings a
        JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
              >= {SIM_PAIRS_TAU}
    ),
    tri AS (
        SELECT e1.label AS label, count(*)::BIGINT AS n_triangles
        FROM pairs e1
        JOIN pairs e2 ON e1.label = e2.label AND e1.vec_b = e2.vec_a
        JOIN pairs e3 ON e1.label = e3.label AND e1.vec_a = e3.vec_a
                     AND e2.vec_b = e3.vec_b
        GROUP BY 1
    )
    SELECT p.label AS label, count(*)::BIGINT AS n_edges,
           coalesce(max(t.n_triangles), 0)::BIGINT AS n_triangles
    FROM pairs p LEFT JOIN tri t ON p.label = t.label
    GROUP BY 1
    """,
    tags=("llm", "graph"),
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting over the similarity graph — the clustering-
    coefficient primitive (a near-dup neighborhood that is also triangle-
    dense is a true clique of rewrites, not a hub-and-spokes artifact).

    The classic distributed formulation: orient every edge low→high id
    (each triangle counted exactly once as a<b<c), then one self-join to
    enumerate open wedges (a<b<c via a-b, b-c) and a second to close them
    against the edge list. Both joins are equi-joins on (label, endpoint) —
    shuffle-partitionable, never a cartesian; at 100 TB the id-orientation
    trick also bounds skew, since high-degree hubs only fan out to
    higher-id neighbors. Edges come from the chunk-pair GEMM path through
    the session memo (sim_pair_edges — eagerly checkpointed once per
    process) and are read by all three aliases — without truncation the
    Arrow pairs job would run per alias."""
    p = sim_pair_edges(spark, sf_dir)
    e1 = p.select("label", F.col("vec_a").alias("a"), F.col("vec_b").alias("b"))
    e2 = p.select(
        F.col("label").alias("l2"), F.col("vec_a").alias("b2"), F.col("vec_b").alias("c2")
    )
    e3 = p.select(
        F.col("label").alias("l3"), F.col("vec_a").alias("a3"), F.col("vec_b").alias("c3")
    )
    tri = (
        e1.join(e2, (F.col("label") == F.col("l2")) & (F.col("b") == F.col("b2")))
        .join(
            e3,
            (F.col("label") == F.col("l3"))
            & (F.col("a") == F.col("a3"))
            & (F.col("c2") == F.col("c3")),
        )
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return (
        p.groupBy("label")
        .agg(F.count(F.lit(1)).alias("n_edges"))
        .join(tri, "label", "left")
        .select(
            "label",
            "n_edges",
            F.coalesce(F.col("n_triangles"), F.lit(0)).alias("n_triangles"),
        )
    )


SIM_RANGE_R = 0.30      # radius (cosine) — nothing in the fixture sits near it
SIM_RANGE_NQUERIES = 8  # query batch size


@query(
    "sim_range",
    oracle=f"""
    SELECT q.vec_id AS qid, e.vec_id,
           round(list_dot_product(q.embedding::DOUBLE[], e.embedding::DOUBLE[]), 4) AS dot
    FROM embeddings q JOIN embeddings e ON e.vec_id != q.vec_id
    WHERE q.vec_id < {SIM_RANGE_NQUERIES}
      AND list_dot_product(q.embedding::DOUBLE[], e.embedding::DOUBLE[]) >= {SIM_RANGE_R}
    """,
    tags=("llm", "similarity"),
)
def sim_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (radius) search — the similarity-API sibling of top-k: ALL
    corpus vectors within cosine ≥ r of each query, result size data-driven
    rather than k-bounded (the retrieval mode dedup thresholds and
    contamination checks want).

    Same scale shape as sim_topk: broadcast the query batch, score the
    partitioned corpus map-side, emit only in-radius rows — no shuffle at
    all (the filter replaces top-k's rank window, so range search is
    actually CHEAPER than top-k at scale). The radius compare uses the
    bit-identical double fold (PARITY.md #9), so membership is exact."""
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < SIM_RANGE_NQUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("q_emb")
    )
    d = dot(F.col("q_emb"), F.col("embedding"))
    return (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .withColumn("raw_dot", d)
        .filter(F.col("raw_dot") >= SIM_RANGE_R)
        .select("qid", "vec_id", F.round("raw_dot", 4).alias("dot"))
    )


# --- round 4: embedding quantization audit ---------------------------------

QUANT_SCALE = 127  # int8 symmetric scalar quantization


@query(
    "embed_quantize",
    oracle=f"""
    WITH q AS (
        SELECT label, embedding::DOUBLE[] AS v,
               list_transform(embedding::DOUBLE[],
                              x -> floor(x * {QUANT_SCALE} + 0.5) / {QUANT_SCALE}.0) AS dq
        FROM embeddings
    ),
    err AS (
        SELECT label,
               sqrt(greatest(list_dot_product(v, v)
                             - 2 * list_dot_product(v, dq)
                             + list_dot_product(dq, dq), 0)) AS rmse,
               list_dot_product(v, dq) AS self_dot
        FROM q
    )
    SELECT label,
           count(*)::BIGINT AS n_vecs,
           round(avg(rmse), 6) AS avg_err,
           round(max(rmse), 6) AS max_err,
           round(min(self_dot), 4) AS min_self_dot
    FROM err GROUP BY label
    """,
    tags=("llm", "embedding", "quantize"),
)
def embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar quantization audit — the storage decision every 100 TB
    embedding corpus makes: symmetric round(x·127)/127 quantization cuts the
    vector column 4× (float32→int8); this op measures what that costs, per
    label: reconstruction L2 error and the worst self-similarity drift
    (dot(v, dq) of a unit vector ≈ 1 − error²/2).

    Numeric parity: the L2 error is computed as √(v·v − 2·v·dq + dq·dq) —
    three dot products in the SAME left-fold order as DuckDB's
    list_dot_product (PARITY.md #9), so both engines produce bit-identical
    doubles BEFORE the final rounding, instead of relying on two different
    elementwise-difference formulations landing inside the round margin.
    The greatest(…, 0) guard absorbs −1e-17-scale cancellation when the
    quantization error of a vector is exactly zero.

    Scale shape: pure map-side arithmetic (one JVM HOF chain per row)
    followed by a partial-agg groupBy on label — one shuffle of 10 rows of
    partials. The quantized column itself would be written with
    `transform(v, x -> cast(round(x*127) as tinyint))`; the audit keeps
    doubles only to measure the error."""
    e = load(spark, sf_dir, "embeddings")
    v = F.transform("embedding", lambda x: x.cast("double"))
    # floor(x·s + 0.5), not round(): per-row round is banned in oracle-checked
    # queries (Spark HALF_UP vs DuckDB tie handling); floor is exact in both.
    dq = F.transform(
        "embedding",
        lambda x: F.floor(x.cast("double") * QUANT_SCALE + 0.5) / float(QUANT_SCALE),
    )
    q = e.select("label", v.alias("v"), dq.alias("dq"))
    err = q.select(
        "label",
        F.sqrt(
            F.greatest(
                dot_d(F.col("v"), F.col("v"))
                - 2 * dot_d(F.col("v"), F.col("dq"))
                + dot_d(F.col("dq"), F.col("dq")),
                F.lit(0.0),
            )
        ).alias("rmse"),
        dot_d(F.col("v"), F.col("dq")).alias("self_dot"),
    )
    return err.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.round(F.avg("rmse"), 6).alias("avg_err"),
        F.round(F.max("rmse"), 6).alias("max_err"),
        F.round(F.min("self_dot"), 4).alias("min_self_dot"),
    )


# --- round 4 (third wave): embedding-space second moments -------------------


@query(
    "embed_covariance",
    oracle="""
    WITH x AS (
        SELECT vec_id, i - 1 AS dim, embedding[i]::DOUBLE AS v
        FROM embeddings, unnest(generate_series(1, len(embedding))) t(i)
    ),
    cells AS (
        SELECT a.dim AS dim_i, b.dim AS dim_j,
               count(*)::BIGINT AS n,
               sum(a.v) AS sx, sum(b.v) AS sy, sum(a.v * b.v) AS sxy
        FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.dim <= b.dim
        GROUP BY 1, 2
    )
    SELECT dim_i, dim_j, n,
           round((sxy - sx * sy / n) / n, 6) + 0.0 AS cov
    FROM cells
    """,
    tags=("llm", "embedding", "stats"),
)
def embed_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding covariance matrix — the d×d second-moment summary that
    feeds PCA whitening, drift monitors, and IVF quantizer diagnostics:
    cov(i,j) for every dimension pair i ≤ j, from raw power sums (Σx, Σy,
    Σxy — the agg_moments/agg_correlation discipline, so the twin is exact
    to the 6-dp round).

    Shape here: posexplode to (vec, dim, value), one equi-join on vec_id
    (fan-out d per side, never vector×vector), partial-agg groupBy on the
    (i, j) pair. The d² output is 2,080 rows at d=64 — driver-sized however
    big the corpus is. At 100 TB the same statistic is better computed as
    per-partition d×d partial Gram matrices via mapInPandas summed in one
    reduce (the sim_pairs_gemm execution shape); this formulation is the
    all-SQL twin that hash-validates the arithmetic."""
    e = load(spark, sf_dir, "embeddings")
    x = e.select(
        "vec_id", F.posexplode("embedding").alias("dim", "v")
    ).select("vec_id", "dim", F.col("v").cast("double").alias("v"))
    xa, xb = x.alias("a"), x.alias("b")
    cells = (
        xa.join(xb, (F.col("a.vec_id") == F.col("b.vec_id")) & (F.col("a.dim") <= F.col("b.dim")))
        .groupBy(F.col("a.dim").alias("dim_i"), F.col("b.dim").alias("dim_j"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("a.v").alias("sx"),
            F.sum("b.v").alias("sy"),
            F.sum(F.col("a.v") * F.col("b.v")).alias("sxy"),
        )
    )
    n = F.col("n")
    return cells.select(
        "dim_i", "dim_j", "n",
        # `+ 0.0` collapses IEEE negative zero: a tiny negative covariance
        # rounds to -0.0, whose repr-based sort key diverges from +0.0 in the
        # canonical compare (PARITY.md rule 17).
        (F.round((F.col("sxy") - F.col("sx") * F.col("sy") / n) / n, 6) + F.lit(0.0)).alias("cov"),
    )


@query(
    "eval_ann_recall",
    oracle=f"""
    WITH bucketed AS (
        SELECT vec_id, embedding,
               ((embedding[1] > 0)::INT * 1 + (embedding[2] > 0)::INT * 2
                + (embedding[3] > 0)::INT * 4 + (embedding[4] > 0)::INT * 8) AS bucket
        FROM embeddings
    ),
    exact AS (
        SELECT qid, vec_id FROM (
            SELECT q.vec_id AS qid, e.vec_id,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY list_dot_product(q.embedding::DOUBLE[], e.embedding::DOUBLE[]) DESC,
                                e.vec_id ASC) AS rank
            FROM embeddings q JOIN embeddings e ON e.vec_id != q.vec_id
            WHERE q.vec_id < {SIM_TOPK_NQUERIES}
        ) WHERE rank <= {SIM_TOPK_K}
    ),
    ann AS (
        SELECT qid, vec_id FROM (
            SELECT q.vec_id AS qid, e.vec_id,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY list_dot_product(q.embedding::DOUBLE[], e.embedding::DOUBLE[]) DESC,
                                e.vec_id ASC) AS rank
            FROM bucketed q JOIN bucketed e
              ON q.bucket = e.bucket AND e.vec_id != q.vec_id
            WHERE q.vec_id < {SIM_TOPK_NQUERIES}
        ) WHERE rank <= {SIM_TOPK_K}
    )
    SELECT x.qid,
           count(a.vec_id)::BIGINT AS n_overlap,
           round(count(a.vec_id) / {SIM_TOPK_K}.0, 4) AS recall_at_k
    FROM exact x LEFT JOIN ann a ON x.qid = a.qid AND x.vec_id = a.vec_id
    GROUP BY x.qid
    """,
    tags=("llm", "similarity", "eval"),
)
def eval_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN index quality evaluation — recall@k of the sign-bit IVF index
    (sim_topk_ann's bucket-restricted search) against exhaustive ground
    truth (sim_topk's brute force), per query. This is the measurement
    every production ANN deployment runs before trusting an index: an
    approximate index without a recall report is a silent-quality bug.

    Both retrieval arms are recomputed inside the query from the SAME
    ranking contract (dot desc, vec_id asc) and intersected per query —
    so the metric itself is hash-checkable, not just eyeballed. At 100 TB
    the ground-truth arm runs on a SAMPLED query set (recall estimation
    needs hundreds of queries, not the corpus) while the ANN arm is the
    production path — exactly the asymmetry shown here (Q=5 queries,
    broadcast; corpus never shuffles)."""
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < SIM_TOPK_NQUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("q_emb"),
        signbit_bucket(F.col("embedding")).alias("q_bucket"),
    )
    corpus = e.withColumn("bucket", signbit_bucket(F.col("embedding")))
    w = Window.partitionBy("qid").orderBy(F.col("raw_dot").desc(), F.col("vec_id").asc())

    def topk(scored):
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= SIM_TOPK_K)
            .select("qid", "vec_id")
        )

    exact = topk(
        corpus.crossJoin(F.broadcast(q.select("qid", "q_emb")))
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", dot(F.col("q_emb"), F.col("embedding")).alias("raw_dot"))
    )
    ann = topk(
        corpus.join(F.broadcast(q), corpus.bucket == q.q_bucket)
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", dot(F.col("q_emb"), F.col("embedding")).alias("raw_dot"))
    )
    hit = ann.withColumn("hit", F.lit(1))
    return (
        exact.join(hit, ["qid", "vec_id"], "left")
        .groupBy("qid")
        .agg(
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_overlap"),
            F.round(
                F.sum(F.coalesce(F.col("hit"), F.lit(0))) / F.lit(float(SIM_TOPK_K)), 4
            ).alias("recall_at_k"),
        )
    )


MATRYOSHKA_DIMS = (8, 16, 32)  # prefix lengths evaluated against full-dim truth


@query(
    "eval_matryoshka_recall",
    oracle=f"""
    WITH exact AS (
        SELECT qid, vec_id FROM (
            SELECT q.vec_id AS qid, e.vec_id,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY list_dot_product(q.embedding::DOUBLE[], e.embedding::DOUBLE[]) DESC,
                                e.vec_id ASC) AS rank
            FROM embeddings q JOIN embeddings e ON e.vec_id != q.vec_id
            WHERE q.vec_id < {SIM_TOPK_NQUERIES}
        ) WHERE rank <= {SIM_TOPK_K}
    ),
    trunc AS (
        SELECT trunc_dim, qid, vec_id FROM (
            SELECT d.trunc_dim, q.vec_id AS qid, e.vec_id,
                   row_number() OVER (
                       PARTITION BY d.trunc_dim, q.vec_id
                       ORDER BY list_dot_product((q.embedding::DOUBLE[])[1:d.trunc_dim],
                                                 (e.embedding::DOUBLE[])[1:d.trunc_dim]) DESC,
                                e.vec_id ASC) AS rank
            FROM embeddings q
            JOIN embeddings e ON e.vec_id != q.vec_id
            CROSS JOIN (VALUES (8), (16), (32)) d(trunc_dim)
            WHERE q.vec_id < {SIM_TOPK_NQUERIES}
        ) WHERE rank <= {SIM_TOPK_K}
    )
    SELECT d.trunc_dim::INT AS trunc_dim, x.qid,
           count(t.vec_id)::BIGINT AS n_overlap,
           round(count(t.vec_id) / {SIM_TOPK_K}.0, 4) AS recall_at_k
    FROM exact x CROSS JOIN (VALUES (8), (16), (32)) d(trunc_dim)
    LEFT JOIN trunc t ON t.trunc_dim = d.trunc_dim AND t.qid = x.qid
                     AND t.vec_id = x.vec_id
    GROUP BY 1, 2
    """,
    tags=("llm", "similarity", "eval"),
)
def eval_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka (truncated-dimension) retrieval evaluation — recall@k of
    top-k under PREFIX-dot (first 8/16/32 of 64 dims) against full-dim
    exhaustive truth, per query and truncation. This is the measurement
    behind the matryoshka-embedding deployment pattern: serve ANN from a
    cheap prefix (memory and GEMM cost scale with dims) and re-rank with
    the full vector — but only after measuring what each prefix loses,
    which is exactly this table. Complements eval_ann_recall (bucket
    pruning loss) and eval_pq_recall (quantization loss): three axes of
    the same recall-gate discipline.

    Shape: queries broadcast (Q rows), corpus never shuffles; the three
    truncations are an exploded constant dim-table folded into ONE scan —
    per-pair cost is the prefix fold, cheaper than the full dot. Prefix
    slicing is zip_with-compatible (slice(emb, 1, d)); fold order matches
    DuckDB's list_dot_product over the same sliced DOUBLE[], so scores are
    bit-identical (the `dot()` contract applied to prefixes). At 100 TB
    the truth arm runs on a sampled query set — the eval_ann_recall
    asymmetry."""
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < SIM_TOPK_NQUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("q_emb")
    )
    pairs = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
    )
    w_full = Window.partitionBy("qid").orderBy(F.col("raw_dot").desc(), F.col("vec_id").asc())
    exact = (
        pairs.select("qid", "vec_id", dot(F.col("q_emb"), F.col("embedding")).alias("raw_dot"))
        .withColumn("rank", F.row_number().over(w_full))
        .filter(F.col("rank") <= SIM_TOPK_K)
        .select("qid", "vec_id")
    )
    dims = F.explode(F.array(*[F.lit(d) for d in MATRYOSHKA_DIMS])).alias("trunc_dim")
    w_tr = Window.partitionBy("trunc_dim", "qid").orderBy(
        F.col("raw_dot").desc(), F.col("vec_id").asc()
    )
    trunc = (
        pairs.select("qid", "vec_id", "q_emb", "embedding", dims)
        .select(
            "trunc_dim",
            "qid",
            "vec_id",
            dot(
                F.slice(F.col("q_emb"), F.lit(1), F.col("trunc_dim")),
                F.slice(F.col("embedding"), F.lit(1), F.col("trunc_dim")),
            ).alias("raw_dot"),
        )
        .withColumn("rank", F.row_number().over(w_tr))
        .filter(F.col("rank") <= SIM_TOPK_K)
        .select("trunc_dim", "qid", "vec_id", F.lit(1).alias("hit"))
    )
    exact_dims = exact.crossJoin(
        F.broadcast(
            spark.createDataFrame([(d,) for d in MATRYOSHKA_DIMS], "trunc_dim int")
        )
    )
    return (
        exact_dims.join(trunc, ["trunc_dim", "qid", "vec_id"], "left")
        .groupBy("trunc_dim", "qid")
        .agg(
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_overlap"),
            F.round(
                F.sum(F.coalesce(F.col("hit"), F.lit(0))) / F.lit(float(SIM_TOPK_K)), 4
            ).alias("recall_at_k"),
        )
    )


@query(
    "sim_topk_multiprobe",
    oracle=f"""
    WITH bucketed AS (
        SELECT vec_id, embedding,
               ((embedding[1] > 0)::INT * 1 + (embedding[2] > 0)::INT * 2
                + (embedding[3] > 0)::INT * 4 + (embedding[4] > 0)::INT * 8) AS bucket
        FROM embeddings
    ),
    probes AS (
        SELECT vec_id AS qid, embedding AS q_emb, p AS probe
        FROM bucketed,
             unnest([bucket, xor(bucket, 1), xor(bucket, 2),
                     xor(bucket, 4), xor(bucket, 8)]) t(p)
        WHERE vec_id < {SIM_TOPK_NQUERIES}
    )
    SELECT qid, vec_id, dot, rank FROM (
        SELECT p.qid, e.vec_id,
               round(list_dot_product(p.q_emb::DOUBLE[], e.embedding::DOUBLE[]), 4) AS dot,
               row_number() OVER (
                   PARTITION BY p.qid
                   ORDER BY list_dot_product(p.q_emb::DOUBLE[], e.embedding::DOUBLE[]) DESC,
                            e.vec_id ASC) AS rank
        FROM probes p JOIN bucketed e
          ON e.bucket = p.probe AND e.vec_id != p.qid
    ) WHERE rank <= {SIM_TOPK_K}
    """,
    tags=("llm", "similarity", "ann"),
)
def sim_topk_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe ANN — the standard recall lever for bucketed indexes
    (multi-probe LSH / IVF nprobe>1): each query searches its own sign-bit
    bucket PLUS the 4 buckets at Hamming distance 1 (one flipped sign bit —
    exactly the buckets a near-boundary vector falls into), trading 5×
    probe cost for the recall the single-bucket search loses at cell
    boundaries. eval_ann_recall measures what this buys (the companion
    property test pins multiprobe recall ≥ single-probe recall per query).

    Scale shape: the probe set is EXPLODED into (qid, probe_bucket) rows
    and the corpus joined by bucket EQUALITY — never a popcount≤1 theta
    join, which would plan a nested loop; nprobe scales the (tiny) query
    side only, the corpus is never replicated or shuffled."""
    e = load(spark, sf_dir, "embeddings")
    corpus = e.withColumn("bucket", signbit_bucket(F.col("embedding")))
    base = corpus.filter(F.col("vec_id") < SIM_TOPK_NQUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("q_emb"), "bucket"
    )
    probes = base.select(
        "qid", "q_emb",
        F.explode(
            F.array(
                F.col("bucket"),
                *[F.col("bucket").bitwiseXOR(F.lit(1 << i)) for i in range(4)],
            )
        ).alias("probe"),
    )
    scored = (
        corpus.join(F.broadcast(probes), corpus.bucket == probes.probe)
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", dot(F.col("q_emb"), F.col("embedding")).alias("raw_dot"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("raw_dot").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= SIM_TOPK_K)
        .select("qid", "vec_id", F.round("raw_dot", 4).alias("dot"), "rank")
    )


PQ_M = 4     # subspaces
PQ_SUB = 16  # dims per subspace (4 × 16 = the 64-dim fixture embedding)
PQ_K = 8     # codes per subspace codebook (8⁴ = 4096 cells over 500 vectors
             # at sf0.01 — K=4 was measured too lossy: recall@5 hit 0.0)

# Squared L2 via three dots — the SAME expression shape in both engines so
# the argmin ties identically (PARITY rule 9: sequential-fold dot products
# are bit-identical across Spark zip_with and DuckDB list_dot_product).
_DUCK_PQ_D2 = (
    "list_dot_product(s.sub, s.sub)"
    " - 2 * list_dot_product(s.sub, c.centroid)"
    " + list_dot_product(c.centroid, c.centroid)"
)

_DUCK_PQ_ASSIGN = f"""
        SELECT vec_id, m, sub, code, d2 FROM (
            SELECT s.vec_id, s.m, s.sub, c.code, {_DUCK_PQ_D2} AS d2,
                   row_number() OVER (PARTITION BY s.vec_id, s.m
                                      ORDER BY {_DUCK_PQ_D2} ASC, c.code ASC) AS rn
            FROM subs s JOIN {{cent}} c ON s.m = c.m) WHERE rn = 1
"""

# Shared PQ-training CTE prefix (subvector explode → init → assign →
# recompute → reassign); embed_pq_codebook audits it, sim_adc_topk queries it.
_DUCK_PQ_CTES = f"""
    subs AS (
        SELECT vec_id, mm.m AS m,
               (embedding[mm.m * {PQ_SUB} + 1 : mm.m * {PQ_SUB} + {PQ_SUB}])::DOUBLE[] AS sub
        FROM embeddings CROSS JOIN (VALUES (0), (1), (2), (3)) mm(m)
    ),
    init AS (
        SELECT m, vec_id::INT AS code, sub AS centroid
        FROM subs WHERE vec_id < {PQ_K}
    ),
    a1 AS ({_DUCK_PQ_ASSIGN.format(cent="init")}),
    c1 AS (
        SELECT m, code, list(v ORDER BY i) AS centroid FROM (
            SELECT m, code, i, avg(vv) AS v
            FROM (SELECT m, code, unnest(sub)::DOUBLE AS vv,
                         unnest(range(len(sub))) AS i FROM a1)
            GROUP BY m, code, i)
        GROUP BY m, code
    ),
    a2 AS ({_DUCK_PQ_ASSIGN.format(cent="c1")})
"""


def _pq_subvectors(e: DataFrame) -> DataFrame:
    """(vec_id, m, sub): each embedding split into PQ_M double subvectors."""
    return (
        e.select(
            "vec_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(m).alias("m"),
                            F.slice("embedding", m * PQ_SUB + 1, PQ_SUB)
                            .cast("array<double>")
                            .alias("sub"),
                        )
                        for m in range(PQ_M)
                    ]
                )
            ).alias("s"),
        )
        .select("vec_id", F.col("s.m").alias("m"), F.col("s.sub").alias("sub"))
    )


def _pq_d2(sub: Column, cent: Column) -> Column:
    """Squared L2 via the three-dot expansion — the same expression shape as
    the oracle so argmins tie bit-identically (PARITY rule 9)."""
    return dot_d(sub, sub) - 2 * dot_d(sub, cent) + dot_d(cent, cent)


# Session-scoped memo of the trained PQ index (round 12): embed_pq_codebook
# and sim_adc_topk each re-ran the identical _pq_train chain (subvector
# explode + two broadcast-assign rank-window passes + centroid recompute)
# at ~1-2 s per consumer in the bench. codes is |vecs|×M rows and codebook
# M×K — both artifact-sized — so one eager checkpoint per (session, sf_dir)
# serves both (the sim_pair_edges convention; fresh processes retrain).
_PQ_FRAMES: dict[tuple[str, str], tuple[DataFrame, DataFrame]] = {}


def _pq_frames(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _PQ_FRAMES:
        from ..session import ensure_checkpoint_dir

        ensure_checkpoint_dir(spark)
        codes, codebook = _pq_train(load(spark, sf_dir, "embeddings"))
        # Both checkpointed: the round-13 driver-rows counter-experiment
        # (see _HYBRID_FRAMES in llm_text.py) measured collected-row
        # materialization as a per-action Python-worker tax on every
        # consumer — the checkpoint scan is pure JVM and wins for
        # Spark-computed frames read by several downstream actions.
        _PQ_FRAMES[key] = (
            codes.checkpoint(eager=True),
            codebook.checkpoint(eager=True),
        )
    return _PQ_FRAMES[key]


def _pq_train(e: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Unrolled PQ k-means (init → assign → recompute → reassign). Returns
    (codes, codebook): codes = (vec_id, m, sub, code, d2) after the final
    assignment; codebook = (m, code, centroid) after the recompute."""
    subs = _pq_subvectors(e)
    init = subs.filter(F.col("vec_id") < PQ_K).select(
        "m", F.col("vec_id").cast("int").alias("code"), F.col("sub").alias("centroid")
    )

    def assign(cent: DataFrame) -> DataFrame:
        w = Window.partitionBy("vec_id", "m").orderBy(F.col("d2").asc(), F.col("code").asc())
        return (
            subs.join(F.broadcast(cent), "m")
            .select(
                "vec_id", "m", "sub", "code",
                _pq_d2(F.col("sub"), F.col("centroid")).alias("d2"),
            )
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn")
        )

    a1 = assign(init)
    c1 = (
        a1.select("m", "code", F.posexplode("sub").alias("pos", "v"))
        .groupBy("m", "code", "pos")
        .agg(F.avg("v").alias("mv"))
        .groupBy("m", "code")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "mv"))), lambda s: s["mv"]
            ).alias("centroid")
        )
    )
    return assign(c1), c1


@query(
    "embed_pq_codebook",
    oracle=f"""
    WITH {_DUCK_PQ_CTES}
    SELECT m, code, count(*)::BIGINT AS n_vecs, round(avg(d2), 6) AS avg_dist2
    FROM a2 GROUP BY m, code
    """,
    tags=("llm", "similarity", "quantization"),
)
def embed_pq_codebook(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization codebook training — the compression half of
    IVF-PQ, the index family that makes billion-vector ANN fit in memory:
    each embedding splits into PQ_M orthogonal subspaces, each subspace
    learns its own PQ_K-centroid codebook (k-means on 16-dim subvectors,
    unrolled init → assign → recompute → reassign exactly like
    sim_ivf_kmeans), and a vector is stored as M small codes (here 4×2
    bits vs 64×4 bytes — a 128:1 blowdown; production uses M=8..64, K=256).
    Emits the codebook audit: per (subspace, code) population and mean
    squared quantization distortion — the number you watch to size K.

    Composes with the rest of the ANN suite: sim_ivf_kmeans is the coarse
    inverted index, THIS is the in-cell compressor, sim_topk the exact
    re-ranker, eval_ann_recall the quality gate.

    Scale shape: subvector explode is map-side (M× rows, 1/M size each);
    assignment is corpus × broadcast(M·K tiny codebook) with a
    (vec_id, m)-keyed rank window; centroid recompute is the (key, pos)
    partial-agg reduction (_centroid_of's shape) so the shuffle carries
    M·K·16 rows. Nothing ever shuffles on a K-valued key. Distances use
    the three-dot expansion so Spark and DuckDB argmin BIT-identically
    (PARITY rule 9)."""
    codes, _ = _pq_frames(spark, sf_dir)
    return codes.groupBy("m", "code").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.round(F.avg("d2"), 6).alias("avg_dist2"),
    )


@query(
    "sim_adc_topk",
    oracle=f"""
    WITH {_DUCK_PQ_CTES},
    lut AS (
        SELECT s.vec_id AS qid, s.m, c.code, {_DUCK_PQ_D2} AS pd2
        FROM subs s JOIN c1 c ON s.m = c.m
        WHERE s.vec_id < {SIM_TOPK_NQUERIES}
    ),
    scored AS (
        SELECT l.qid, a.vec_id,
               sum(CASE WHEN a.m = 0 THEN l.pd2 END)
                 + sum(CASE WHEN a.m = 1 THEN l.pd2 END)
                 + sum(CASE WHEN a.m = 2 THEN l.pd2 END)
                 + sum(CASE WHEN a.m = 3 THEN l.pd2 END) AS adist2
        FROM a2 a JOIN lut l ON l.m = a.m AND l.code = a.code
        WHERE a.vec_id != l.qid
        GROUP BY l.qid, a.vec_id
    )
    SELECT qid, vec_id, round(adist2, 6) AS adist2, rank FROM (
        SELECT *, row_number() OVER (PARTITION BY qid
                                     ORDER BY adist2 ASC, vec_id ASC) AS rank
        FROM scored
    ) WHERE rank <= {SIM_TOPK_K}
    """,
    tags=("llm", "similarity", "quantization"),
)
def sim_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric distance computation over the PQ index — how a
    PQ-compressed corpus is actually QUERIED: the query stays full
    precision; per subspace a PQ_K-entry lookup table of
    (query-subvector → centroid) distances is built, and each document's
    approximate distance is the sum of M table lookups selected by its
    stored codes — no document vector is ever touched at query time,
    which is the entire point of the compression. Top-K per query by
    approximate distance (a production system then exact-reranks the
    shortlist — sim_rerank's job; eval_ann_recall measures the loss).

    Determinism: the per-document sum is M=4 floats whose ADDITION ORDER
    must match across engines or near-ties rank-flip — so the subspace
    distances pivot into four explicit columns and add left-to-right
    (d0+d1+d2+d3) in BOTH dialects; each pd2 is the three-dot expansion
    (PARITY rule 9), making the ranking bit-deterministic.

    Scale shape: the LUT is queries × M·K (tiny, broadcast); scoring is a
    (m, code) EQUI-join of the 2-bit code table against the LUT — the
    shuffle carries codes, never vectors; per-(qid, doc) reduction is a
    partial agg; top-K is a rank window per qid."""
    codes, codebook = _pq_frames(spark, sf_dir)
    q_subs = _pq_subvectors(
        load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < SIM_TOPK_NQUERIES)
    ).select(F.col("vec_id").alias("qid"), "m", "sub")
    lut = q_subs.join(F.broadcast(codebook), "m").select(
        "qid", "m", "code", _pq_d2(F.col("sub"), F.col("centroid")).alias("pd2")
    )
    scored = (
        codes.select("vec_id", "m", "code")
        .join(F.broadcast(lut), ["m", "code"])
        .filter(F.col("vec_id") != F.col("qid"))
        .groupBy("qid", "vec_id")
        .agg(*[
            F.sum(F.when(F.col("m") == m, F.col("pd2"))).alias(f"d{m}")
            for m in range(PQ_M)
        ])
        .select(
            "qid", "vec_id",
            (F.col("d0") + F.col("d1") + F.col("d2") + F.col("d3")).alias("adist2"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("adist2").asc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= SIM_TOPK_K)
        .select("qid", "vec_id", F.round("adist2", 6).alias("adist2"), "rank")
    )


@query(
    "eval_pq_recall",
    oracle=f"""
    WITH {_DUCK_PQ_CTES},
    lut AS (
        SELECT s.vec_id AS qid, s.m, c.code, {_DUCK_PQ_D2} AS pd2
        FROM subs s JOIN c1 c ON s.m = c.m
        WHERE s.vec_id < {SIM_TOPK_NQUERIES}
    ),
    adc AS (
        SELECT qid, vec_id FROM (
            SELECT l.qid, a.vec_id,
                   row_number() OVER (PARTITION BY l.qid ORDER BY
                       sum(CASE WHEN a.m = 0 THEN l.pd2 END)
                         + sum(CASE WHEN a.m = 1 THEN l.pd2 END)
                         + sum(CASE WHEN a.m = 2 THEN l.pd2 END)
                         + sum(CASE WHEN a.m = 3 THEN l.pd2 END) ASC,
                       a.vec_id ASC) AS rank
            FROM a2 a JOIN lut l ON l.m = a.m AND l.code = a.code
            WHERE a.vec_id != l.qid
            GROUP BY l.qid, a.vec_id
        ) WHERE rank <= {SIM_TOPK_K}
    ),
    exact AS (
        SELECT qid, vec_id FROM (
            SELECT q.vec_id AS qid, e.vec_id,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY list_dot_product(q.embedding::DOUBLE[], e.embedding::DOUBLE[]) DESC,
                                e.vec_id ASC) AS rank
            FROM embeddings q JOIN embeddings e ON e.vec_id != q.vec_id
            WHERE q.vec_id < {SIM_TOPK_NQUERIES}
        ) WHERE rank <= {SIM_TOPK_K}
    )
    SELECT x.qid,
           count(a.vec_id)::BIGINT AS n_overlap,
           round(count(a.vec_id) / {SIM_TOPK_K}.0, 4) AS recall_at_k
    FROM exact x LEFT JOIN adc a ON x.qid = a.qid AND x.vec_id = a.vec_id
    GROUP BY x.qid
    """,
    tags=("llm", "similarity", "eval", "quantization"),
)
def eval_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the PQ/ADC shortlist against exhaustive cosine truth —
    eval_ann_recall's twin for the COMPRESSION index (that one gates the
    bucketing index): per query, how many of the true top-K survive
    4×2-bit quantization. This is the number that decides M and K — lossy
    compression without a measured recall figure is not an index, it's a
    hope. Fixture vectors are exactly unit-norm, so ADC's L2 ordering ≡
    the cosine truth ordering and the measured gap is PURE quantization
    loss: mean recall@5 ≈ 0.24 at M=4/K=8 on the sf0.01 corpus — which is
    the gate doing its job (at this loss you raise K or M, or widen the
    shortlist and exact-rerank, before shipping the index; production
    M=8..64, K=256 sits far up this curve).

    Scale shape: both arms are the already-audited plans (sim_topk's
    broadcast query batch; sim_adc_topk's LUT + code equi-join); the
    comparison is a (qid, vec_id) equi-join of two K·NQ-row shortlists —
    free. Run it per index build; alert when recall drifts."""
    exact = sim_topk(spark, sf_dir).select("qid", "vec_id")
    adc = sim_adc_topk(spark, sf_dir).select(
        "qid", F.col("vec_id").alias("a_vec")
    )
    return (
        exact.join(
            adc,
            (exact.qid == adc.qid) & (exact.vec_id == F.col("a_vec")),
            "left",
        )
        .drop(adc.qid)
        .groupBy("qid")
        .agg(
            F.count("a_vec").alias("n_overlap"),
            F.round(F.count("a_vec") / float(SIM_TOPK_K), 4).alias("recall_at_k"),
        )
    )


@query(
    "embed_hygiene_audit",
    oracle="""
    SELECT label,
           count(*)::BIGINT AS n_vecs,
           min(len(embedding))::BIGINT AS dim_min,
           max(len(embedding))::BIGINT AS dim_max,
           sum(len(list_filter(embedding,
                               x -> isnan(x) OR abs(x) = 'infinity'::FLOAT)))::BIGINT
               AS n_nonfinite,
           round(avg(sqrt(list_sum(list_transform(embedding::DOUBLE[],
                                                  x -> x * x)))), 4) AS avg_norm,
           min(list_min(embedding)) AS min_comp,
           max(list_max(embedding)) AS max_comp
    FROM embeddings GROUP BY label
    """,
    tags=("llm", "similarity"),
)
def embed_hygiene_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-table hygiene gate — the audit that runs BEFORE any index
    build or similarity job trusts the vectors: per label, row count,
    dimensionality min/max (one wrong-dim row breaks a GEMM batch at step
    40k — catch it here), non-finite component count (NaN/Inf poison every
    distance they touch), mean L2 norm (≈1.0 certifies the normalization
    the cosine≡dot shortcut in this module depends on — the audit is the
    PROOF of the fixture contract the sim_* ops cite), and the global
    component range (quantization calibration input for embed_quantize).

    All facets are per-row map-side expressions (JVM higher-order folds,
    the module's zip_with/aggregate discipline — list order is the fold
    order in both engines, so norms are bit-identical) reducing to one
    label-keyed partial agg; nothing shuffles vectors. At 100 TB this is
    one pass over the embedding store, the cheapest possible shape."""
    e = load(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    bad = lambda x: F.isnan(x) | (F.abs(x) == F.lit(float("inf")))  # noqa: E731
    norm = F.sqrt(
        F.aggregate(
            F.transform(emb, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return e.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.min(F.size(emb)).cast("long").alias("dim_min"),
        F.max(F.size(emb)).cast("long").alias("dim_max"),
        F.sum(F.size(F.filter(emb, bad)).cast("long")).alias("n_nonfinite"),
        F.round(F.avg(norm), 4).alias("avg_norm"),
        F.min(F.array_min(emb)).alias("min_comp"),
        F.max(F.array_max(emb)).alias("max_comp"),
    )


# --- round 5 continuation: k-NN graph + PCA ---------------------------------

KNN_GRAPH_K = 4  # out-degree of the directed kNN graph

# Shared CTE text: directed kNN edges inside sign-bit buckets, then the
# mutual (bidirectional) subset — used by knn_graph_mutual and
# graph_label_propagation so both provably walk the same graph.
_DUCK_MUTUAL_CTES = f"""
    {adaptive_bucket_duck_ctes()},
    knn_edges AS (
        SELECT src, dst, dot FROM (
            SELECT a.vec_id AS src, b.vec_id AS dst,
                   list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) AS dot,
                   row_number() OVER (
                       PARTITION BY a.vec_id
                       ORDER BY list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) DESC,
                                b.vec_id ASC) AS rank
            FROM bucketed a JOIN bucketed b
              ON a.bucket = b.bucket AND a.vec_id != b.vec_id
        ) WHERE rank <= {KNN_GRAPH_K}
    ),
    mutual AS (
        SELECT a.src, a.dst, a.dot
        FROM knn_edges a JOIN knn_edges b ON a.src = b.dst AND a.dst = b.src
    )"""


def mutual_knn_edges(e: DataFrame, n_bits: int | None = None) -> DataFrame:
    """Directed mutual-kNN edge list (src, dst, dot) — both orientations of
    every surviving edge. Candidates come from the sign-bit quantizer
    equi-join (sim_topk_ann's scale path), the per-source top-k is a rank
    window, and mutuality is a self-equi-join on the reversed pair. Shared
    by knn_graph_mutual (canonical pair output) and
    graph_label_propagation (neighborhood votes).

    Bucket sizing: by default (n_bits=None) the width ADAPTS to the corpus
    via with_adaptive_bucket — the memo build paid the same fixed-4-bit
    quadratic the 10x sweep flagged on dedup_embed (173 s at the decade,
    SCALE.md), and VERDICT r7 item 3 makes n_bits ≈ log2(N / target) the
    default rather than a caller knob. _DUCK_MUTUAL_CTES mirrors the
    adaptive rule, so the oracled consumers stay hash-exact at every sf.
    Pass an explicit ``n_bits`` only to pin a static width."""
    if n_bits is None:
        eb = with_adaptive_bucket(e)
    else:
        eb = e.withColumn("bucket", signbit_bucket(F.col("embedding"), n_bits))
    a, b = eb.alias("a"), eb.alias("b")
    scored = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.vec_id") != F.col("b.vec_id")),
    ).select(
        F.col("a.vec_id").alias("src"),
        F.col("b.vec_id").alias("dst"),
        dot(F.col("a.embedding"), F.col("b.embedding")).alias("dot"),
    )
    w = Window.partitionBy("src").orderBy(F.col("dot").desc(), F.col("dst").asc())
    edges = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= KNN_GRAPH_K)
        .select("src", "dst", "dot")
    )
    ea, eb2 = edges.alias("ea"), edges.alias("eb")
    return ea.join(
        eb2,
        (F.col("ea.src") == F.col("eb.dst")) & (F.col("ea.dst") == F.col("eb.src")),
    ).select(F.col("ea.src").alias("src"), F.col("ea.dst").alias("dst"), F.col("ea.dot").alias("dot"))


@query(
    "knn_graph_mutual",
    oracle=f"""
    WITH {_DUCK_MUTUAL_CTES}
    SELECT src AS vec_a, dst AS vec_b, round(dot, 4) AS cosine
    FROM mutual WHERE src < dst
    """,
    tags=("llm", "similarity", "graph"),
)
def knn_graph_mutual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual k-NN graph — the neighborhood structure under semantic dedup,
    diversity sampling, and density-based corpus clustering (mutual-kNN is
    the standard noise-robust sparsifier: an edge survives only if BOTH
    endpoints rank each other in their top-k, which strips the hub edges
    that plain kNN graphs grow in high dimensions).

    Shape: candidate generation INSIDE sign-bit quantizer buckets (the
    sim_topk_ann scale path — an equi-join on bucket, never all-pairs; at
    100 TB n_bits grows with the corpus so per-bucket cost stays flat),
    rank window per source with vec_id tiebreak, then the mutuality check
    is a self-equi-join of the directed edge list on the reversed pair —
    O(N·k) rows, hash-join on (src, dst). Canonical src < dst orientation
    halves the output; graph_* / dedup_cluster ops compose downstream.
    The edge list comes from the session memo (mutual_knn_edge_frame) —
    checkpointed once per process, shared with graph_label_propagation."""
    return (
        mutual_knn_edge_frame(spark, sf_dir)
        .filter(F.col("src") < F.col("dst"))
        .select(
            F.col("src").alias("vec_a"),
            F.col("dst").alias("vec_b"),
            F.round(F.col("dot"), 4).alias("cosine"),
        )
    )


@query(
    "embed_pca_power",
    oracle="""
    WITH x AS (
        SELECT vec_id, i - 1 AS dim, embedding[i]::DOUBLE AS v
        FROM embeddings, unnest(generate_series(1, len(embedding))) t(i)
    ),
    c AS (
        SELECT a.dim AS i, b.dim AS j,
               (sum(a.v * b.v) - sum(a.v) * sum(b.v) / count(*)) / count(*) AS cov
        FROM x a JOIN x b ON a.vec_id = b.vec_id GROUP BY 1, 2
    ),
    r1 AS (SELECT i AS dim, sum(cov) AS w FROM c GROUP BY 1),
    v1 AS (SELECT dim, w / sqrt((SELECT sum(w * w) FROM r1)) AS val FROM r1),
    r2 AS (SELECT c.i AS dim, sum(c.cov * v1.val) AS w
           FROM c JOIN v1 ON c.j = v1.dim GROUP BY 1),
    v2 AS (SELECT dim, w / sqrt((SELECT sum(w * w) FROM r2)) AS val FROM r2),
    mu AS (SELECT dim, avg(v) AS mu FROM x GROUP BY dim),
    sc AS (SELECT x.vec_id, sum((x.v - mu.mu) * v2.val) AS score
           FROM x JOIN mu ON x.dim = mu.dim JOIN v2 ON x.dim = v2.dim GROUP BY 1),
    sgn AS (SELECT CASE WHEN sum(score * score * score) >= 0 THEN 1.0 ELSE -1.0 END AS s
            FROM sc)
    SELECT sc.vec_id, e.label, round(sc.score * sgn.s, 4) + 0.0 AS pc1
    FROM sc JOIN embeddings e ON sc.vec_id = e.vec_id CROSS JOIN sgn
    """,
    tags=("llm", "embedding", "stats"),
)
def embed_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First principal component by power iteration — embedding-space
    structure discovery (dominant drift axis, whitening input, 1-D corpus
    ordering) as a PURE dataframe computation with an exact SQL twin, no
    eigensolver: covariance matrix from power sums (embed_covariance's
    arithmetic, full d×d here), two matvec+normalize rounds from the
    all-ones start vector, then the centered projection of every embedding
    onto the resulting direction.

    Determinism without a driver round-trip: the start vector is constant
    (its scale folds out in the first normalization), iteration count is
    FIXED at 2 (an approximation of the true eigenvector, identical in both
    dialects — the point is the exact twin, not convergence; production
    iterates to tolerance like dedup_cluster's rounds), and the sign
    ambiguity of eigenvectors is pinned by the corpus itself: scores are
    flipped so the projection skewness Σ score³ is non-negative — a smooth
    one-aggregate functional, no tie-prone argmax (fixture margin measured
    ≫ float noise at every SF).

    Scale shape: d×d cells via the vec_id equi-join (fan-out d per side,
    never vector×vector), matvecs are joins against BROADCAST d-row
    vectors, norms are broadcast 1-row aggregates (no .collect()), and the
    projection is one more partial agg over the exploded corpus. At 100 TB
    the cov pass is better run as per-partition GEMM partials
    (sim_pairs_gemm's shape); this formulation is the hash-checked
    arithmetic twin."""
    e = load(spark, sf_dir, "embeddings")
    x = e.select("vec_id", F.posexplode("embedding").alias("dim", "v")).select(
        "vec_id", "dim", F.col("v").cast("double").alias("v")
    )
    xa, xb = x.alias("a"), x.alias("b")
    n = F.col("n")
    c = (
        xa.join(xb, F.col("a.vec_id") == F.col("b.vec_id"))
        .groupBy(F.col("a.dim").alias("i"), F.col("b.dim").alias("j"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("a.v").alias("sx"),
            F.sum("b.v").alias("sy"),
            F.sum(F.col("a.v") * F.col("b.v")).alias("sxy"),
        )
        .select("i", "j", ((F.col("sxy") - F.col("sx") * F.col("sy") / n) / n).alias("cov"))
        # NOT checkpointed: the audit's 29-scan plan looks like per-consumer
        # recompute, but the repeated subtrees share shuffles via
        # ReusedExchange at runtime — an eager checkpoint here measured
        # SLOWER (6-12.8 s vs 3.1 s at sf0.1: the d-squared write costs more
        # than the shared recompute). Same negative result as
        # ngram_sim_edges' cache note; measure before materializing.
    )

    def normalize(r: DataFrame) -> DataFrame:
        ss = r.agg(F.sum(F.col("w") * F.col("w")).alias("ss"))
        return r.crossJoin(F.broadcast(ss)).select(
            "dim", (F.col("w") / F.sqrt("ss")).alias("val")
        )

    r1 = c.groupBy("i").agg(F.sum("cov").alias("w")).select(F.col("i").alias("dim"), "w")
    v1 = normalize(r1)
    r2 = (
        c.join(F.broadcast(v1.withColumnRenamed("dim", "j")), "j")
        .groupBy("i")
        .agg(F.sum(F.col("cov") * F.col("val")).alias("w"))
        .select(F.col("i").alias("dim"), "w")
    )
    v2 = normalize(r2)
    mu = x.groupBy("dim").agg(F.avg("v").alias("mu"))
    sc = (
        x.join(F.broadcast(mu), "dim")
        .join(F.broadcast(v2), "dim")
        .groupBy("vec_id")
        .agg(F.sum((F.col("v") - F.col("mu")) * F.col("val")).alias("score"))
    )
    sgn = sc.agg(
        F.when(F.sum(F.col("score") * F.col("score") * F.col("score")) >= 0, F.lit(1.0))
        .otherwise(F.lit(-1.0))
        .alias("s")
    )
    return (
        sc.crossJoin(F.broadcast(sgn))
        .join(e.select("vec_id", "label"), "vec_id")
        .select(
            "vec_id",
            "label",
            (F.round(F.col("score") * F.col("s"), 4) + F.lit(0.0)).alias("pc1"),
        )
    )


LP_SEEDS = 100   # vec_id < LP_SEEDS keep their ground-truth label
LP_ROUNDS = 2    # unrolled propagation rounds (fixed for the SQL twin)


@query(
    "graph_label_propagation",
    oracle=f"""
    WITH {_DUCK_MUTUAL_CTES},
    seeds AS (
        SELECT vec_id AS node, label FROM embeddings WHERE vec_id < {LP_SEEDS}
    ),
    v1 AS (
        SELECT m.src AS node, s.label, count(*)::BIGINT AS n
        FROM mutual m JOIN seeds s ON m.dst = s.node
        WHERE m.src NOT IN (SELECT node FROM seeds)
        GROUP BY 1, 2
    ),
    l1 AS (
        SELECT node, label FROM (
            SELECT *, row_number() OVER (PARTITION BY node
                                         ORDER BY n DESC, label ASC) AS rn
            FROM v1
        ) WHERE rn = 1
    ),
    lab1 AS (
        SELECT node, label, 0 AS src_round FROM seeds
        UNION ALL SELECT node, label, 1 FROM l1
    ),
    v2 AS (
        SELECT m.src AS node, t.label, count(*)::BIGINT AS n
        FROM mutual m JOIN lab1 t ON m.dst = t.node
        WHERE m.src NOT IN (SELECT node FROM lab1)
        GROUP BY 1, 2
    ),
    l2 AS (
        SELECT node, label FROM (
            SELECT *, row_number() OVER (PARTITION BY node
                                         ORDER BY n DESC, label ASC) AS rn
            FROM v2
        ) WHERE rn = 1
    )
    SELECT node AS vec_id, label AS pred_label, src_round FROM lab1
    UNION ALL SELECT node, label, 2 FROM l2
    """,
    tags=("llm", "similarity", "graph"),
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-supervised label propagation over the mutual-kNN graph — the
    graph-side twin of knn_label: a small labeled seed set (the LP_SEEDS
    lowest vec_ids keep their ground-truth label) spreads to unlabeled
    nodes by majority vote of already-labeled neighbors, seeds clamped,
    two unrolled rounds (fixed so the DuckDB twin stays expressible; the
    production loop iterates to quiescence like min_label_components).
    Emits (vec_id, pred_label, src_round) — src_round 0 = seed, 1/2 = the
    round the node was first labeled; unreached nodes are absent.

    Scale shape: rides mutual_knn_edges (bucketed candidates, never
    all-pairs). Each round is one equi-join of the edge list against the
    current label frame + a (node, label) partial-agg vote + a rank window
    — edge-list-sized shuffles, the dedup_cluster discipline. Ties break
    (n_votes DESC, label ASC) identically in both dialects."""
    e = load(spark, sf_dir, "embeddings")
    # Edges via the SESSION MEMO (mutual_knn_edge_frame), not a per-op
    # checkpoint. History: a per-op eager checkpoint measured SLOWER than
    # letting the two vote rounds share the subtree via ReusedExchange
    # (≈10 s vs 4.3 s at sf0.1, round 5), so this op deliberately didn't
    # checkpoint — which meant a full-registry drive rebuilt the same edge
    # list here AND in knn_graph_mutual, and the cold cost landed on
    # whichever ran first (BENCH_r06's 2-4× swing — VERDICT r6 item 2).
    # The memo keeps the per-process total strictly lower: the subtree +
    # checkpoint write are paid ONCE per session, and both this op's vote
    # rounds and knn_graph_mutual read the truncated frame.
    edges = mutual_knn_edge_frame(spark, sf_dir).select("src", "dst")
    seeds = (
        e.filter(F.col("vec_id") < LP_SEEDS)
        .select(F.col("vec_id").alias("node"), "label")
        .withColumn("src_round", F.lit(0))
    )
    labeled = seeds

    def one_round(labeled: DataFrame, rnd: int) -> DataFrame:
        votes = (
            edges.join(
                labeled.select(F.col("node").alias("dst"), "label"), "dst"
            )
            .join(
                labeled.select(F.col("node").alias("src")), "src", "left_anti"
            )
            .groupBy(F.col("src").alias("node"), "label")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        w = Window.partitionBy("node").orderBy(F.col("n").desc(), F.col("label").asc())
        return (
            votes.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("node", "label", F.lit(rnd).alias("src_round"))
        )

    for rnd in range(1, LP_ROUNDS + 1):
        labeled = labeled.unionByName(one_round(labeled, rnd))
    return labeled.select(
        F.col("node").alias("vec_id"),
        F.col("label").alias("pred_label"),
        "src_round",
    )


MAXSIM_NQUERIES = 5  # query batch (vec_id < MAXSIM_NQUERIES)
MAXSIM_K = 5         # emitted depth per query


@query(
    "sim_maxsim_multivector",
    oracle=f"""
    WITH subs AS (
        SELECT vec_id, i - 1 AS m,
               (embedding::DOUBLE[])[(i - 1) * {PQ_SUB} + 1 : (i - 1) * {PQ_SUB} + {PQ_SUB}] AS sub
        FROM embeddings, unnest(generate_series(1, {PQ_M})) t(i)
    ),
    cell AS (
        SELECT q.vec_id AS qid, d.vec_id, q.m,
               max(list_dot_product(q.sub, d.sub)) AS mx
        FROM subs q JOIN subs d ON d.vec_id != q.vec_id
        WHERE q.vec_id < {MAXSIM_NQUERIES}
        GROUP BY 1, 2, 3
    ),
    score AS (SELECT qid, vec_id, sum(mx) AS s FROM cell GROUP BY 1, 2)
    SELECT qid, vec_id, round(s, 4) AS maxsim, rank FROM (
        SELECT *, row_number() OVER (PARTITION BY qid
                                     ORDER BY s DESC, vec_id ASC) AS rank
        FROM score
    ) WHERE rank <= {MAXSIM_K}
    """,
    tags=("llm", "similarity"),
)
def sim_maxsim_multivector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-interaction (ColBERT-style MaxSim) retrieval — the multi-vector
    scoring shape single-vector sim_topk cannot express: each side is a SET
    of subvectors (here the PQ_M×PQ_SUB subspace split of the fixture
    embedding standing in for per-token vectors), and
    score(q, d) = Σ_i max_j <q_i, d_j> — every query part finds its best
    match anywhere in the document. Top-k per query with vec_id tiebreak.

    Scale shape: the query batch explodes to Q×PQ_M broadcast-sized
    subvectors; documents explode once to N×PQ_M (linear, map-side). The
    join is broadcast(query-subs) × doc-subs, the max-per-(q, d, i) and
    sum-per-(q, d) are partial aggs, and the final top-k is a rank window
    per query. At 100 TB the doc side would pre-bucket by an ANN quantizer
    exactly as sim_topk_ann does; the MaxSim algebra is unchanged."""
    e = load(spark, sf_dir, "embeddings")
    subs = _pq_subvectors(e)
    qsub = (
        subs.filter(F.col("vec_id") < MAXSIM_NQUERIES)
        .select(F.col("vec_id").alias("qid"), F.col("m").alias("qm"), F.col("sub").alias("qsub"))
    )
    cell = (
        subs.join(F.broadcast(qsub), F.col("vec_id") != F.col("qid"))
        .groupBy("qid", "vec_id", "qm")
        .agg(F.max(dot_d(F.col("qsub"), F.col("sub"))).alias("mx"))
    )
    score = cell.groupBy("qid", "vec_id").agg(F.sum("mx").alias("s"))
    w = Window.partitionBy("qid").orderBy(F.col("s").desc(), F.col("vec_id").asc())
    return (
        score.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= MAXSIM_K)
        .select("qid", "vec_id", F.round("s", 4).alias("maxsim"), "rank")
    )


OUTLIER_MD_TAU = 1.01  # normalized Mahalanobis fence. The fixture corpus is
                       # in-distribution by construction (md concentrates at
                       # ~1.0 ± 0.02 for iid unit vectors), so the fence sits
                       # in the measured tail: a handful of flags per SF.


@query(
    "embed_outlier_score",
    oracle=f"""
    WITH x AS (
        SELECT vec_id, label, i - 1 AS dim, embedding[i]::DOUBLE AS v
        FROM embeddings, unnest(generate_series(1, len(embedding))) t(i)
    ),
    stats AS (
        SELECT dim, avg(v) AS mu,
               sum(v * v) / count(*) - avg(v) * avg(v) AS var
        FROM x GROUP BY dim
    ),
    d2 AS (
        SELECT x.vec_id, x.label,
               sum(coalesce((x.v - s.mu) * (x.v - s.mu) / nullif(s.var, 0), 0)) AS dist2,
               count(*)::BIGINT AS d
        FROM x JOIN stats s ON x.dim = s.dim
        GROUP BY 1, 2
    )
    SELECT vec_id, label,
           round(sqrt(dist2 / d), 4) AS md,
           round(sqrt(dist2 / d), 4) > {OUTLIER_MD_TAU} AS is_outlier
    FROM d2
    """,
    tags=("llm", "embedding", "quality"),
)
def embed_outlier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding outlier scoring — diagonal-Mahalanobis distance of every
    vector from the corpus distribution (per-dimension mean/variance), the
    hygiene filter that catches mis-encoded, truncated, or off-manifold
    vectors BEFORE they poison ANN indexes and centroid training
    (embed_hygiene_audit checks norms/NaNs; this checks SHAPE). Normalized
    by dimension count so the score is comparable across embedding sizes;
    flagging uses a fixed threshold, not a data-dependent percentile — a
    percentile cut needs a second global pass, while the fixed fence is one
    map-side comparison (clean_winsorize shows the two-pass form).

    Scale shape: the per-dim stats are ONE d-row aggregate (explode +
    partial aggs); the scoring pass folds each vector against the
    BROADCAST mu/var arrays with a JVM higher-order zip_with — no per-row
    join, no Python, one map-side pass over the corpus. The oracle computes
    the identical sum via the explode-join formulation (4-dp round absorbs
    fold-order noise, PARITY rule 6)."""
    e = load(spark, sf_dir, "embeddings")
    x = e.select("vec_id", F.posexplode("embedding").alias("dim", "v")).select(
        "dim", F.col("v").cast("double").alias("v")
    )
    stats = x.groupBy("dim").agg(
        F.avg("v").alias("mu"),
        (F.sum(F.col("v") * F.col("v")) / F.count(F.lit(1))
         - F.avg("v") * F.avg("v")).alias("var"),
    )
    arrs = stats.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "mu"))), lambda s: s["mu"]
        ).alias("mu_arr"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "var"))), lambda s: s["var"]
        ).alias("var_arr"),
    )
    centered = F.zip_with(
        F.col("embedding").cast("array<double>"),
        F.col("mu_arr"),
        lambda v, m: v - m,
    )
    # A zero-variance dimension contributes 0 on BOTH sides: without the
    # coalesce the NULL from nullif would poison the whole fold here while
    # DuckDB's sum() silently skips the NULL term (ADVICE r5) — a latent
    # engine divergence on degenerate dimensions.
    dist2 = F.aggregate(
        F.zip_with(
            centered,
            F.col("var_arr"),
            lambda c, s: F.coalesce(c * c / F.nullif(s, F.lit(0.0)), F.lit(0.0)),
        ),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )
    md = F.sqrt(dist2 / F.size("embedding"))
    return (
        e.crossJoin(F.broadcast(arrs))
        .select(
            "vec_id",
            "label",
            F.round(md, 4).alias("md"),
            # flag on the ROUNDED score: both dialects' rounded md is the
            # hash-checked column, so the flag can never flip on fold-order
            # noise at the fence (the sim_pairs margin discipline, made
            # structural)
            (F.round(md, 4) > OUTLIER_MD_TAU).alias("is_outlier"),
        )
    )


DIVERSE_K = 5  # docs kept per quantizer bucket


@query(
    "corpus_diverse_sample",
    oracle=f"""
    WITH bucketed AS (
        SELECT e.vec_id AS doc_id, d.lang, d.n_chars,
               ((e.embedding[1] > 0)::INT * 1 + (e.embedding[2] > 0)::INT * 2
                + (e.embedding[3] > 0)::INT * 4 + (e.embedding[4] > 0)::INT * 8) AS bucket
        FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id
    )
    SELECT bucket, doc_id, lang, n_chars, rank FROM (
        SELECT *, row_number() OVER (PARTITION BY bucket
                                     ORDER BY n_chars DESC, doc_id ASC) AS rank
        FROM bucketed
    ) WHERE rank <= {DIVERSE_K}
    """,
    tags=("llm", "corpus"),
)
def corpus_diverse_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity-stratified corpus sampling — the selection step after
    dedup/quality: instead of a global top-N (which over-picks one dense
    region of embedding space), partition the corpus by the sign-bit
    quantizer bucket (each bucket ≈ a semantic region) and keep the top
    docs per bucket by a quality key (doc length here; any score column
    slots in). The embarrassingly parallel cousin of maximal-marginal-
    relevance: bucket-stratification buys the diversity, a rank window
    buys the quality ordering, and no pairwise similarity is ever computed
    at selection time.

    Scale shape: one broadcast-able doc↔embedding equi-join, then
    topk_per_group's exact plan — rank window over one bucket-keyed
    shuffle; buckets grow with n_bits as the corpus grows (signbit_bucket's
    sizing note), keeping per-bucket sort cost flat."""
    e = load(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), signbit_bucket(F.col("embedding")).alias("bucket")
    )
    d = load(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    w = Window.partitionBy("bucket").orderBy(F.col("n_chars").desc(), F.col("doc_id").asc())
    return (
        e.join(d, "doc_id")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= DIVERSE_K)
        .select("bucket", "doc_id", "lang", "n_chars", "rank")
    )


KCORE_K = 2  # minimum in-core degree
KCORE_ORACLE_PEELS = 8  # unrolled oracle depth ≥ measured fixture fixpoint
KCORE_MAX_ROUNDS = 40  # loop safety cap; exhausting it raises (never ships)


def _kcore_oracle_sql(peels: int) -> str:
    """Unrolled peel CTE chain. The oracle mirrors the Spark loop round-for-
    round; `peels` is sized ABOVE the fixture's measured fixpoint depth
    (5–7 across sf0.001/0.01/0.1), so extra rounds are no-ops and the two
    engines land on the same fixpoint. Every CTE is MATERIALIZED: edges{{r+1}}
    references edges{{r}} three times, so DuckDB's default inlining would
    expand the chain 3^peels-fold (measured: EMFILE from thousands of
    parquet re-opens at 8 peels)."""
    parts = [
        f"""
    WITH pairs AS MATERIALIZED (
        SELECT a.label AS label, a.vec_id AS vec_a, b.vec_id AS vec_b
        FROM embeddings a
        JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
              >= {SIM_PAIRS_TAU}
    ),
    edges0 AS MATERIALIZED (
        SELECT label, vec_a AS src, vec_b AS dst FROM pairs
        UNION ALL
        SELECT label, vec_b AS src, vec_a AS dst FROM pairs
    )"""
    ]
    for r in range(peels):
        parts.append(
            f""",
    alive{r} AS MATERIALIZED (
        SELECT label, src FROM edges{r} GROUP BY label, src
        HAVING count(*) >= {KCORE_K}
    ),
    edges{r + 1} AS MATERIALIZED (
        SELECT e.label, e.src, e.dst FROM edges{r} e
        JOIN alive{r} a ON e.label = a.label AND e.src = a.src
        JOIN alive{r} b ON e.label = b.label AND e.dst = b.src
    )"""
        )
    parts.append(
        f"""
    SELECT label, src AS vec_id, count(*)::BIGINT AS core_degree
    FROM edges{peels} GROUP BY label, src
    """
    )
    return "".join(parts)


# Dedicated driver-peel bound (optimization round 13, VERDICT r12 item 2:
# the CC bound was memory-mis-sized for THIS structure). CC_DRIVER_MAX_EDGES
# (2M) was justified as ~64 MB of long tuples for union-find; the peel below
# builds a Python dict of SETS of (label, vec) TUPLES — ~10-20x fatter per
# directed edge (tuple 64 B + set-entry ~60 B + shared key objects), so the
# same 2M-edge bound would be several GB of driver RSS. 200 k directed edges
# keeps the adjacency structure at ~40-80 MB, the same memory envelope the
# CC bound was sized for; above it the distributed peel loop runs unchanged
# (the 100 TB path).
KCORE_DRIVER_MAX_EDGES = 200_000


@query("graph_kcore", oracle=_kcore_oracle_sql(KCORE_ORACLE_PEELS), tags=("llm", "graph"))
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition (k=2) of the similarity graph by iterative
    peeling — the community-pruning primitive: a node survives only while
    it keeps ≥ k neighbors that themselves survive, so hub-and-spoke
    artifacts and pendant chains fall away and what remains is the densely
    interconnected duplicate/community core (the complement of what
    dedup's CC keeps — CC keeps everything reachable, k-core keeps only
    the cohesive part).

    Each peel round = one degree aggregate + two alive-list equi-joins,
    all label-blocked. The Spark side peels to TRUE convergence — the
    dedup_cluster_pd loop discipline: edge count tracked per round
    (shrinks monotonically, so equal counts ⇒ fixpoint), eager checkpoint
    every other round truncates lineage, and exhausting KCORE_MAX_ROUNDS
    raises rather than shipping a partial core (the CC convergence-guard
    rule). The DuckDB twin unrolls KCORE_ORACLE_PEELS ≥ the fixture's
    measured fixpoint depth, so surplus oracle rounds are no-ops and both
    engines emit the same fixpoint. At 100 TB rounds are O(degeneracy) —
    bounded for similarity graphs whose block size the LSH/blocking
    already caps."""
    from ..session import ensure_checkpoint_dir

    ensure_checkpoint_dir(spark)
    p = sim_pair_edges(spark, sf_dir)
    # Scale-adaptive peel (round 12, guide §1.2/§5 — the llm_dedup CC fast
    # path's twin): sim_pair_edges is the REDUCED pair artifact (the
    # distributed GEMM already collapsed the corpus to |τ-pairs| rows, and
    # the memo holds it checkpointed), so when it is provably small the
    # peel rounds as Spark jobs are pure per-round overhead. Below the
    # bound, peel on the driver — the k-core is the UNIQUE maximal
    # subgraph with min-degree ≥ K, so simultaneous-round peeling (the
    # loop) and sequential peeling (below) reach the identical fixpoint.
    # Above the bound the loop runs unchanged — the 100 TB path.
    if p.count() * 2 <= KCORE_DRIVER_MAX_EDGES:
        from collections import defaultdict, deque

        adj: dict = defaultdict(set)
        for r in p.select("label", "vec_a", "vec_b").collect():
            adj[(r[0], r[1])].add((r[0], r[2]))
            adj[(r[0], r[2])].add((r[0], r[1]))
        work = deque(n for n, nb in adj.items() if len(nb) < KCORE_K)
        while work:
            n = work.popleft()
            if n not in adj or len(adj[n]) >= KCORE_K:
                continue
            for m in adj.pop(n):
                nb = adj.get(m)
                if nb is not None:
                    nb.discard(n)
                    if len(nb) < KCORE_K:
                        work.append(m)
        lt = p.schema["label"].dataType.simpleString()
        vt = p.schema["vec_a"].dataType.simpleString()
        return spark.createDataFrame(
            sorted((lab, vec, len(nb)) for (lab, vec), nb in adj.items()),
            f"label {lt}, vec_id {vt}, core_degree long",
        )

    edges = p.select("label", F.col("vec_a").alias("src"), F.col("vec_b").alias("dst")).unionAll(
        p.select("label", F.col("vec_b").alias("src"), F.col("vec_a").alias("dst"))
    )
    n_edges = edges.count()
    for rnd in range(KCORE_MAX_ROUNDS):
        alive = (
            edges.groupBy("label", "src")
            .agg(F.count(F.lit(1)).alias("deg"))
            .filter(F.col("deg") >= KCORE_K)
            .select("label", "src")
        )
        edges = edges.join(alive, ["label", "src"]).join(
            alive.select("label", F.col("src").alias("dst")), ["label", "dst"]
        )
        if rnd % 2 == 1:
            edges = edges.checkpoint(eager=True)
        n_next = edges.count()
        if n_next == n_edges:
            break
        n_edges = n_next
    else:
        raise RuntimeError(
            f"graph_kcore: no fixpoint within {KCORE_MAX_ROUNDS} peel rounds "
            f"(edges still shrinking at {n_edges}); raising instead of "
            "shipping a partial core"
        )
    return edges.groupBy("label", F.col("src").alias("vec_id")).agg(
        F.count(F.lit(1)).alias("core_degree")
    )


@query(
    "graph_jaccard_neighbors",
    oracle=f"""
    WITH pairs AS (
        SELECT a.label AS label, a.vec_id AS vec_a, b.vec_id AS vec_b
        FROM embeddings a
        JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
              >= {SIM_PAIRS_TAU}
    ),
    edges AS (
        SELECT label, vec_a AS src, vec_b AS dst FROM pairs
        UNION ALL
        SELECT label, vec_b AS src, vec_a AS dst FROM pairs
    ),
    deg AS (
        SELECT label, src, count(*)::BIGINT AS d FROM edges GROUP BY label, src
    ),
    common AS (
        SELECT e1.label, e1.src AS vec_a, e2.src AS vec_b,
               count(*)::BIGINT AS n_common
        FROM edges e1
        JOIN edges e2 ON e1.label = e2.label AND e1.dst = e2.dst
                     AND e1.src < e2.src
        GROUP BY e1.label, e1.src, e2.src
    )
    SELECT c.label, c.vec_a, c.vec_b, c.n_common,
           round(c.n_common / (da.d + db.d - c.n_common), 4) AS jaccard
    FROM common c
    JOIN deg da ON c.label = da.label AND c.vec_a = da.src
    JOIN deg db ON c.label = db.label AND c.vec_b = db.src
    """,
    tags=("llm", "graph"),
)
def graph_jaccard_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neighborhood-Jaccard node similarity — the classic link-prediction /
    entity-resolution feature: two nodes are structurally similar when
    their neighbor SETS overlap (|N(a) ∩ N(b)| / |N(a) ∪ N(b)|), whether
    or not they share an edge themselves. On a near-dup graph this is the
    second-order signal that catches pairs the direct similarity edge
    missed: two rewrites that each match the same third document.

    Shape: candidate pairs are enumerated ONLY through shared neighbors
    (the wedge join on (label, dst) — triangle count's first hop), never
    all-pairs, so the cost is Σ_n deg(n)² — bounded by the same hub
    treatment as the triangle op (id-ordering halves each wedge). Degrees
    join back on the node key; union denominator by inclusion-exclusion
    from the two degrees and the intersection count, no set collection.
    The edge list comes from the session memo (sim_pair_edges) — a cheap
    checkpoint scan; the wedge join dominates and runs once."""
    p = sim_pair_edges(spark, sf_dir)
    edges = p.select("label", F.col("vec_a").alias("src"), F.col("vec_b").alias("dst")).unionAll(
        p.select("label", F.col("vec_b").alias("src"), F.col("vec_a").alias("dst"))
    )
    deg = edges.groupBy("label", "src").agg(F.count(F.lit(1)).alias("d"))
    e1 = edges.select("label", F.col("src").alias("vec_a"), "dst")
    e2 = edges.select("label", F.col("src").alias("vec_b"), "dst")
    common = (
        e1.join(e2, ["label", "dst"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .groupBy("label", "vec_a", "vec_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    da = deg.select("label", F.col("src").alias("vec_a"), F.col("d").alias("d_a"))
    db = deg.select("label", F.col("src").alias("vec_b"), F.col("d").alias("d_b"))
    return (
        common.join(da, ["label", "vec_a"])
        .join(db, ["label", "vec_b"])
        .select(
            "label",
            "vec_a",
            "vec_b",
            "n_common",
            F.round(
                F.col("n_common") / (F.col("d_a") + F.col("d_b") - F.col("n_common")), 4
            ).alias("jaccard"),
        )
    )


# Oracle recursion bound == Spark loop cap, so depth overflow raises on the
# Spark side instead of silently diverging (the ADVICE r5 kcore rule).
# Unlike kcore's UNROLLED CTE text, the twin here is a bounded RECURSIVE CTE,
# so a generous bound costs the oracle nothing; sized from measured seed
# eccentricity (6 at sf0.001/0.01, 17 at sf0.1 — long drift chains).
BFS_MAX_HOPS = 40


@query(
    "graph_bfs_distance",
    oracle=f"""
    WITH RECURSIVE pairs AS MATERIALIZED (
        SELECT a.label AS label, a.vec_id AS vec_a, b.vec_id AS vec_b
        FROM embeddings a
        JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
              >= {SIM_PAIRS_TAU}
    ),
    edges AS MATERIALIZED (
        SELECT label, vec_a AS src, vec_b AS dst FROM pairs
        UNION ALL
        SELECT label, vec_b AS src, vec_a AS dst FROM pairs
    ),
    seeds AS (SELECT label, min(src) AS node FROM edges GROUP BY label),
    reach(label, node, d) AS (
        SELECT label, node, 0 FROM seeds
        UNION
        SELECT e.label, e.dst, r.d + 1
        FROM reach r JOIN edges e ON e.label = r.label AND e.src = r.node
        WHERE r.d < {BFS_MAX_HOPS}
    )
    SELECT label, node AS vec_id, min(d)::BIGINT AS dist
    FROM reach GROUP BY 1, 2
    """,
    tags=("llm", "graph"),
)
def graph_bfs_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS hop distance over the similarity graph — the fourth
    iterative graph primitive (CC labels membership, PageRank weights,
    k-core prunes; BFS measures REACH): per label block, hop count from the
    block's canonical seed (its minimum node id, dedup_cluster's
    representative convention) to every reachable node. The pipeline use:
    "how far is this doc from its cluster representative" is the
    provenance-depth feature that separates direct near-dups (dist 1) from
    chains of drifted rewrites (dist ≥ 2), which transitive-closure labels
    alone can't distinguish.

    Execution shape — per-BLOCK BFS in Arrow tasks, not a driver round
    loop: the label blocks are bounded by construction (the same contract
    that sizes block_pairs_gemm's chunks and kcore's peel joins), so each
    block's BFS fits one task; `applyInPandas` groups the edge list by
    label and runs a vectorized frontier sweep per group (boolean
    adjacency matrix, frontier |= frontier @ adj — numpy bitwise matmul,
    no per-edge Python). Parallelism is across blocks; per-task memory is
    O(block²) bits, bounded. The ALTERNATIVE distributed formulation
    (frontier ⋈ edges per round with anti-join against visited) was
    measured first: 77 s at sf0.1 vs ~2 s for this shape — 15 driver
    rounds of shuffle latency on tiny frontiers is exactly the iterative-
    overhead trap SCALE.md documents; reach for it only when a single
    component exceeds task memory. The kcore/CC guard discipline applies:
    a block not converged within BFS_MAX_HOPS raises (never partial), and
    the cap equals the oracle's recursion bound so a depth overflow can't
    silently diverge (the ADVICE r5 kcore rule applied from birth). The
    DuckDB twin is the bounded recursive closure with min(d) — surplus
    depth is a no-op on both sides.

    Cites: same edge construction as graph_kcore (sim_pair_edges session
    memo — chunk-pair GEMM, never all-pairs row loops)."""
    import numpy as np
    import pandas as pd

    p = sim_pair_edges(spark, sf_dir)
    max_hops = BFS_MAX_HOPS

    def bfs_block(pdf: pd.DataFrame) -> pd.DataFrame:
        # Level-synchronous sweep over the EDGE ARRAY (gather frontier at
        # edge sources, scatter-OR into destinations) — O(E) per hop and
        # O(E) memory, no dense n×n adjacency, so a block 100× the fixture
        # size still fits a task (same rationale as graph_closeness's
        # bit-packed form; a single source needs no bit-packing).
        label = pdf["label"].iloc[0]
        ids = np.unique(np.concatenate([pdf["vec_a"].values, pdf["vec_b"].values]))
        idx = {v: i for i, v in enumerate(ids)}
        n = len(ids)
        ai = pdf["vec_a"].map(idx).values.astype(np.int64)
        bi = pdf["vec_b"].map(idx).values.astype(np.int64)
        src = np.concatenate([ai, bi])
        dst = np.concatenate([bi, ai])
        dist = np.full(n, -1, dtype=np.int64)
        frontier = np.zeros(n, dtype=bool)
        frontier[idx[ids.min()]] = True  # canonical seed = min node id
        d = 0
        while frontier.any():
            dist[frontier] = d
            if d > max_hops:
                raise RuntimeError(
                    f"graph_bfs_distance: block {label} not converged within "
                    f"{max_hops} hops (exceeds the oracle's recursion bound)"
                )
            nxt = np.zeros(n, dtype=bool)
            np.logical_or.at(nxt, dst, frontier[src])
            frontier = nxt & (dist < 0)
            d += 1
        reached = dist >= 0
        return pd.DataFrame(
            {"label": label, "vec_id": ids[reached], "dist": dist[reached]}
        )

    return p.groupBy("label").applyInPandas(
        bfs_block, schema="label int, vec_id long, dist long"
    )


@query(
    "graph_closeness",
    oracle=f"""
    WITH RECURSIVE pairs AS MATERIALIZED (
        SELECT a.label AS label, a.vec_id AS vec_a, b.vec_id AS vec_b
        FROM embeddings a
        JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
              >= {SIM_PAIRS_TAU}
    ),
    edges AS MATERIALIZED (
        SELECT label, vec_a AS src, vec_b AS dst FROM pairs
        UNION ALL
        SELECT label, vec_b AS src, vec_a AS dst FROM pairs
    ),
    nodes AS (SELECT DISTINCT label, src AS node FROM edges),
    reach(label, src, node, d) AS (
        SELECT label, node, node, 0 FROM nodes
        UNION
        SELECT r.label, r.src, e.dst, r.d + 1
        FROM reach r JOIN edges e ON e.label = r.label AND e.src = r.node
        WHERE r.d < {BFS_MAX_HOPS}
    ),
    sp AS (
        SELECT label, src, node, min(d)::BIGINT AS d
        FROM reach GROUP BY 1, 2, 3
    )
    SELECT label, src AS vec_id,
           (count(*) - 1)::BIGINT AS n_reachable,
           sum(d)::BIGINT AS sum_dist,
           ((count(*) - 1) * 1000000 // greatest(sum(d), 1))::BIGINT
               AS closeness_ppm
    FROM sp GROUP BY 1, 2
    """,
    tags=("llm", "graph"),
)
def graph_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closeness centrality over the similarity graph — the fifth graph
    primitive (membership → CC, influence → PageRank, cohesion → k-core,
    reach depth → BFS; closeness measures CENTRALITY OF POSITION:
    (n_reachable) / Σ hop-distance, high for the node nearest to everything
    in its component). On a near-dup graph the max-closeness node is the
    natural cluster EXEMPLAR — the doc to keep when collapsing a duplicate
    cluster by representativeness rather than min-id.

    Execution: all-pairs BFS per label block in ONE Arrow task per block —
    graph_bfs_distance's vectorized frontier sweep run from an identity
    frontier matrix (numpy boolean matmul per hop, O(diam) matmuls per
    block, n ≤ block size). Same bounded-block contract; same guard: a
    block not converged within BFS_MAX_HOPS raises. The ratio ships as
    integer PPM (rule 25) so it hash-matches the recursive-closure twin
    exactly — no float division at the output boundary.

    Cites: sim_pair_edges session-memo edges (never all-pairs row loops);
    the DuckDB twin is the bounded recursive closure grouped to per-source
    shortest paths."""
    import numpy as np
    import pandas as pd

    p = sim_pair_edges(spark, sf_dir)
    max_hops = BFS_MAX_HOPS

    def closeness_block(pdf: pd.DataFrame) -> pd.DataFrame:
        # All-pairs BFS as a level-synchronous sweep over the EDGE ARRAY
        # with the source dimension BIT-PACKED into uint64 words: per hop,
        # gather each edge's source-row bitset and OR-reduce per
        # destination (sorted edges + bitwise_or.reduceat — fully
        # vectorized, no Python loop over edges). Work per hop is
        # O(E · n/64); the first cut's dense frontier @ adj matmul was
        # O(n³) per hop and measured a 45× cliff at the 10× decade
        # (2048-node blocks); this form re-measured flat. No n×n distance
        # matrix either: per-hop popcounts of the NEW bits accumulate
        # n_reachable / sum_dist directly, so memory is O(n²/64) bits.
        label = pdf["label"].iloc[0]
        ids = np.unique(np.concatenate([pdf["vec_a"].values, pdf["vec_b"].values]))
        idx = {v: i for i, v in enumerate(ids)}
        n = len(ids)
        ai = pdf["vec_a"].map(idx).values.astype(np.int64)
        bi = pdf["vec_b"].map(idx).values.astype(np.int64)
        src = np.concatenate([ai, bi])
        dst = np.concatenate([bi, ai])
        order = np.argsort(dst, kind="stable")
        src, dst = src[order], dst[order]
        starts = np.flatnonzero(np.r_[True, dst[1:] != dst[:-1]])
        uniq_dst = dst[starts]

        words = (n + 63) // 64
        eye_bits = np.zeros((n, words), dtype=np.uint64)
        rows = np.arange(n)
        eye_bits[rows, rows // 64] = np.uint64(1) << (rows % 64).astype(np.uint64)
        reached = eye_bits.copy()
        frontier = eye_bits
        n_reach = np.zeros(n, dtype=np.int64)
        sum_dist = np.zeros(n, dtype=np.int64)

        def popcount_rows(bits: np.ndarray) -> np.ndarray:
            return np.unpackbits(bits.view(np.uint8), axis=1).sum(axis=1).astype(np.int64)

        d = 0
        while frontier.any():
            d += 1
            if d > max_hops:
                raise RuntimeError(
                    f"graph_closeness: block {label} not converged within "
                    f"{max_hops} hops (exceeds the oracle's recursion bound)"
                )
            contrib = np.bitwise_or.reduceat(frontier[src], starts, axis=0)
            nxt = np.zeros_like(frontier)
            nxt[uniq_dst] = contrib
            nxt &= ~reached
            if not nxt.any():
                break
            reached |= nxt
            new_counts = popcount_rows(nxt)
            n_reach += new_counts
            sum_dist += d * new_counts
            frontier = nxt
        return pd.DataFrame(
            {
                "label": label,
                "vec_id": ids,
                "n_reachable": n_reach,
                "sum_dist": sum_dist,
                "closeness_ppm": n_reach * 1_000_000 // np.maximum(sum_dist, 1),
            }
        )

    return p.groupBy("label").applyInPandas(
        closeness_block,
        schema="label int, vec_id long, n_reachable long, sum_dist long,"
        " closeness_ppm long",
    )


@query(
    "graph_clustering_coefficient",
    oracle=f"""
    WITH pairs AS MATERIALIZED (
        SELECT a.label AS label, a.vec_id AS vec_a, b.vec_id AS vec_b
        FROM embeddings a
        JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
              >= {SIM_PAIRS_TAU}
    ),
    tri AS MATERIALIZED (
        SELECT e1.label AS label, e1.vec_a AS a, e1.vec_b AS b, e2.vec_b AS c
        FROM pairs e1
        JOIN pairs e2 ON e1.label = e2.label AND e1.vec_b = e2.vec_a
        JOIN pairs e3 ON e1.label = e3.label AND e1.vec_a = e3.vec_a
                     AND e2.vec_b = e3.vec_b
    ),
    tri_nodes AS (
        SELECT label, v, count(*)::BIGINT AS n_tri FROM (
            SELECT label, a AS v FROM tri
            UNION ALL SELECT label, b AS v FROM tri
            UNION ALL SELECT label, c AS v FROM tri
        ) GROUP BY 1, 2
    ),
    deg AS (
        SELECT label, v, count(*)::BIGINT AS degree FROM (
            SELECT label, vec_a AS v FROM pairs
            UNION ALL SELECT label, vec_b AS v FROM pairs
        ) GROUP BY 1, 2
    )
    SELECT d.label AS label, d.v AS vec_id, d.degree,
           coalesce(t.n_tri, 0)::BIGINT AS n_tri,
           ((2 * coalesce(t.n_tri, 0) * 1000000)
            // nullif(d.degree * (d.degree - 1), 0))::BIGINT AS cc_ppm
    FROM deg d LEFT JOIN tri_nodes t ON d.label = t.label AND d.v = t.v
    """,
    tags=("llm", "graph"),
)
def graph_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient per node — cc(v) = 2·T(v) / (deg(v)·
    (deg(v)−1)) over the label-blocked similarity graph. The per-NODE
    refinement of graph_triangle_count's per-block census: a near-dup
    neighborhood whose members each close most of their wedges is a true
    clique of rewrites; a hub whose coefficient is ~0 is a boilerplate
    attractor (every doc similar to a template, templates unrelated to
    each other) — the distinction drives which dedup keeper policy is
    safe.

    Same oriented a<b<c triangle enumeration (two equi-joins, never a
    cartesian; id-orientation bounds hub fan-out), then each triangle is
    EXPLODED to its three corners and counted per node — one extra
    hash agg over triangle rows, the classic distributed formulation.
    Degrees come from the undirected edge expansion of the same
    checkpointed pair list (the GEMM job runs once for all three
    consumers — graph_triangle_count's truncation rule). All-integer
    output: the coefficient ships as parts-per-million via integer
    division (rule 25), nullif-guarded so degree-1 nodes emit NULL, never
    a divide-by-zero.

    At 100 TB the joins key on (label, endpoint) — shuffle-partitionable,
    and the blocking cap on |block| bounds the wedge count per key."""
    p = sim_pair_edges(spark, sf_dir)
    e1 = p.select("label", F.col("vec_a").alias("a"), F.col("vec_b").alias("b"))
    e2 = p.select(
        F.col("label").alias("l2"), F.col("vec_a").alias("b2"), F.col("vec_b").alias("c2")
    )
    e3 = p.select(
        F.col("label").alias("l3"), F.col("vec_a").alias("a3"), F.col("vec_b").alias("c3")
    )
    tri = (
        e1.join(e2, (F.col("label") == F.col("l2")) & (F.col("b") == F.col("b2")))
        .join(
            e3,
            (F.col("label") == F.col("l3"))
            & (F.col("a") == F.col("a3"))
            & (F.col("c2") == F.col("c3")),
        )
        .select("label", "a", "b", F.col("c2").alias("c"))
    )
    tri_nodes = (
        tri.select("label", F.explode(F.array("a", "b", "c")).alias("v"))
        .groupBy("label", "v")
        .agg(F.count(F.lit(1)).alias("n_tri"))
    )
    deg = (
        p.select("label", F.col("vec_a").alias("v"))
        .unionAll(p.select("label", F.col("vec_b").alias("v")))
        .groupBy("label", "v")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    return (
        deg.join(tri_nodes, ["label", "v"], "left")
        .withColumn("n_tri", F.coalesce(F.col("n_tri"), F.lit(0)))
        .select(
            "label",
            F.col("v").alias("vec_id"),
            "degree",
            "n_tri",
            F.expr(
                "CAST(2 * n_tri * 1000000 DIV nullif(degree * (degree - 1), 0) AS BIGINT)"
            ).alias("cc_ppm"),
        )
    )


@query(
    "graph_assortativity",
    oracle=f"""
    WITH pairs AS MATERIALIZED (
        SELECT a.label AS label, a.vec_id AS vec_a, b.vec_id AS vec_b
        FROM embeddings a
        JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
              >= {SIM_PAIRS_TAU}
    ),
    deg AS MATERIALIZED (
        SELECT label, v, count(*)::BIGINT AS degree FROM (
            SELECT label, vec_a AS v FROM pairs
            UNION ALL SELECT label, vec_b AS v FROM pairs
        ) GROUP BY 1, 2
    ),
    dir_edges AS (
        SELECT label, vec_a AS src, vec_b AS dst FROM pairs
        UNION ALL SELECT label, vec_b, vec_a FROM pairs
    )
    SELECT e.label AS label,
           (count(*) / 2)::BIGINT AS n_edges,
           round(corr(ds.degree, dd.degree), 4) + 0.0 AS assortativity
    FROM dir_edges e
    JOIN deg ds ON e.label = ds.label AND e.src = ds.v
    JOIN deg dd ON e.label = dd.label AND e.dst = dd.v
    GROUP BY 1
    """,
    tags=("llm", "graph"),
)
def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity per similarity-graph block — the Pearson
    correlation of endpoint degrees over the (symmetrized) edge list, the
    standard Newman formulation. Positive: dense dup cliques attach to
    each other (safe to collapse whole neighborhoods); negative:
    hub-and-spoke boilerplate attractors (graph_clustering_coefficient's
    warning sign, summarized to one number per block). Completes the
    graph-stats family: degree_stats profiles the distribution,
    clustering coefficient the local closure, assortativity the mixing.

    Each undirected edge enters twice (both orientations) per the
    standard estimator, so corr sees every (deg_u, deg_v) pair
    symmetrically; degrees are exact integers, so both engines correlate
    identical pairs and only corr's fold order drifts — aggregate-level
    round (rule 6), -0.0 guard. A degree-regular block (zero variance)
    yields NULL, identically.

    Scale: degrees and the two decorations are (label, endpoint)
    equi-joins on the checkpointed GEMM pairs (sim_pair_edges session
    memo) — the same bounded-block contract as every graph op here."""
    p = sim_pair_edges(spark, sf_dir)
    deg = (
        p.select("label", F.col("vec_a").alias("v"))
        .unionAll(p.select("label", F.col("vec_b").alias("v")))
        .groupBy("label", "v")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    dir_edges = p.select("label", F.col("vec_a").alias("src"), F.col("vec_b").alias("dst")).unionAll(
        p.select("label", F.col("vec_b").alias("src"), F.col("vec_a").alias("dst"))
    )
    ds = deg.select(
        F.col("label").alias("l1"), F.col("v").alias("v1"), F.col("degree").alias("deg_src")
    )
    dd = deg.select(
        F.col("label").alias("l2"), F.col("v").alias("v2"), F.col("degree").alias("deg_dst")
    )
    return (
        dir_edges.join(ds, (F.col("label") == F.col("l1")) & (F.col("src") == F.col("v1")))
        .join(dd, (F.col("label") == F.col("l2")) & (F.col("dst") == F.col("v2")))
        .groupBy("label")
        .agg(
            (F.count(F.lit(1)) / 2).cast("long").alias("n_edges"),
            (F.round(F.corr("deg_src", "deg_dst"), 4) + F.lit(0.0)).alias("assortativity"),
        )
    )


RP_OUT_DIMS = 8  # Johnson-Lindenstrauss target dimensionality


@query(
    "embed_random_projection",
    oracle=f"""
    WITH mat AS MATERIALIZED (
        SELECT t.i, u.j,
               CASE WHEN substr(md5(t.i::VARCHAR || ':' || u.j::VARCHAR), 1, 1) < '8'
                    THEN 1 ELSE -1 END AS s
        FROM range(64) t(i), range({RP_OUT_DIMS}) u(j)
    ),
    expanded AS (
        SELECT e.vec_id, m.j, e.embedding[m.i + 1]::DOUBLE * m.s AS term
        FROM embeddings e, mat m
    )
    SELECT vec_id, j::INT AS out_dim,
           round(sum(term), 6) + 0.0 AS proj
    FROM expanded GROUP BY vec_id, j
    """,
    tags=("llm", "embedding"),
)
def embed_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss random projection — 64-dim embeddings sketched
    to {RP_OUT_DIMS} dims with a deterministic ±1 matrix (the
    Achlioptas construction: sign from an md5 nibble of (row:col), the
    same seeded-hash discipline every sampler here uses — never rand(),
    so train and serve project identically forever). The dim-reduction
    member of the embed family: PCA (embed_pca_power) learns the
    directions, JL buys distance preservation WITHOUT a fitted model —
    the right first stage for ANN prefiltering and the sketch behind
    sim_topk_multiprobe-style probing at lower memory.

    Shape: the {64 * RP_OUT_DIMS}-entry sign matrix is generated from
    range()×range() and BROADCAST; vectors posexplode once and the
    projection is a (vec, out_dim) partial agg of x_i·s_ij — matmul as
    fold, all JVM-side. Sum order differs per engine → aggregate-level
    round (rule 6) with the -0.0 guard; the ±1 entries and the float
    elements are exact on both sides.

    At 100 TB: map-side expand ×{RP_OUT_DIMS} with immediate combine —
    no shuffle grows with dimensionality; for big K swap the explode for
    a Pandas-UDF GEMM over Arrow batches (sim_pairs_gemm's pattern)."""
    e = load(spark, sf_dir, "embeddings")
    mat = (
        spark.range(64)
        .select(F.col("id").alias("i"))
        .crossJoin(spark.range(RP_OUT_DIMS).select(F.col("id").alias("j")))
        .select(
            "i",
            "j",
            F.when(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("i").cast("string"), F.lit(":"), F.col("j").cast("string")
                        )
                    ),
                    1,
                    1,
                )
                < "8",
                1,
            )
            .otherwise(-1)
            .alias("s"),
        )
    )
    expanded = (
        e.select("vec_id", F.posexplode("embedding").alias("i", "x"))
        .join(F.broadcast(mat), "i")
        .select("vec_id", "j", (F.col("x").cast("double") * F.col("s")).alias("term"))
    )
    return expanded.groupBy("vec_id", F.col("j").cast("int").alias("out_dim")).agg(
        (F.round(F.sum("term"), 6) + F.lit(0.0)).alias("proj")
    )


SWEEP_TAUS_X100 = (30, 35, 40, 45, 50)  # threshold grid for the dedup sweep


@query(
    "dedup_threshold_sweep",
    oracle=f"""
    WITH pair_dots AS MATERIALIZED (
        SELECT a.label AS label,
               list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) AS d
        FROM embeddings a
        JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
              >= {SWEEP_TAUS_X100[0] / 100}
    ),
    wide AS (
        SELECT label,
               {', '.join(f"sum(CASE WHEN d >= {t / 100} THEN 1 ELSE 0 END)::BIGINT AS c{t}" for t in SWEEP_TAUS_X100)}
        FROM pair_dots GROUP BY label
    )
    {' UNION ALL '.join(f"SELECT label, {t}::INT AS tau_x100, c{t} AS n_pairs FROM wide" for t in SWEEP_TAUS_X100)}
    """,
    tags=("llm", "dedup"),
)
def dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-threshold tuning curve — candidate-pair volume per label block
    at a grid of cosine cutoffs, from ONE pair enumeration at the loosest
    τ. This is the diagnostic every near-dup rollout runs before picking
    τ: the elbow in pairs-vs-τ separates true rewrite mass from the noise
    floor, and the per-block split shows which sources collapse first.
    The τ-gap rule dedup_embed_cluster documents (cluster τ above pair τ)
    is chosen by exactly this readout.

    Two-stage exactness WITHOUT a per-threshold margin: candidates come
    from the chunk-pair GEMM at τ_min − 1e-6 (a slack band ~11 orders of
    magnitude wider than the measured reorder error ≤ 5.6e-17, so no
    true τ_min pair can be missed regardless of fold order), then every
    candidate's dot is RECOMPUTED with the JVM zip_with fold —
    bit-identical to list_dot_product (rule 9) — and all five threshold
    comparisons run on that exact value. The GEMM never decides a
    threshold; it only bounds the candidate set. Counts are integers;
    the wide→long unpivot is a stack over the per-label rollup.

    Scale: the first formulation ran the fold dot inside the salted
    block self-join — Σ block²·dim JVM work, measured as a 148× cliff
    at the 10x decade (3.9 → 570 s); the GEMM prefilter restores the
    vectorized candidate path (clustering-coefficient's decade shape)
    and the exact re-verification touches only emitted pairs."""
    e = load(spark, sf_dir, "embeddings")
    cand = block_pairs_gemm(e, "label", SWEEP_TAUS_X100[0] / 100 - 1e-6).select(
        F.col("blk").alias("label"), "vec_a", "vec_b"
    )
    ea = e.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a"))
    eb = e.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b"))
    pair_dots = (
        cand.join(ea, "vec_a")
        .join(eb, "vec_b")
        .select("label", dot(F.col("emb_a"), F.col("emb_b")).alias("d"))
        .filter(F.col("d") >= SWEEP_TAUS_X100[0] / 100)
    )
    wide = pair_dots.groupBy("label").agg(
        *[
            F.sum(F.when(F.col("d") >= t / 100, 1).otherwise(0)).alias(f"c{t}")
            for t in SWEEP_TAUS_X100
        ]
    )
    stack_args = ", ".join(f"{t}, c{t}" for t in SWEEP_TAUS_X100)
    return wide.select(
        "label",
        F.expr(f"stack({len(SWEEP_TAUS_X100)}, {stack_args}) AS (tau_x100, n_pairs)"),
    ).select("label", F.col("tau_x100").cast("int").alias("tau_x100"), "n_pairs")


MMR_NQUERIES = 8   # query batch
MMR_C = 10         # stage-1 candidate depth fed to the diversifier
# lambda = 0.5 exactly (binary fraction): score = 0.5*rel - 0.5*max_sim


@query(
    "eval_mmr_diversify",
    oracle=f"""
    WITH cands AS MATERIALIZED (
        SELECT qid, vec_id, emb, rel FROM (
            SELECT q.vec_id AS qid, e.vec_id, e.embedding AS emb,
                   list_dot_product(q.embedding::DOUBLE[], e.embedding::DOUBLE[]) AS rel,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY list_dot_product(q.embedding::DOUBLE[],
                                                 e.embedding::DOUBLE[]) DESC,
                                e.vec_id ASC) AS r
            FROM embeddings q JOIN embeddings e ON e.vec_id != q.vec_id
            WHERE q.vec_id < {MMR_NQUERIES}
        ) WHERE r <= {MMR_C}
    ),
    p1 AS MATERIALIZED (
        SELECT qid, vec_id, emb, rel FROM (
            SELECT qid, vec_id, emb, rel,
                   row_number() OVER (PARTITION BY qid
                                      ORDER BY rel DESC, vec_id ASC) AS r
            FROM cands
        ) WHERE r = 1
    ),
    p2 AS MATERIALIZED (
        SELECT qid, vec_id, emb, score FROM (
            SELECT c.qid, c.vec_id, c.emb,
                   0.5 * c.rel - 0.5 * list_dot_product(c.emb::DOUBLE[], p.emb::DOUBLE[])
                       AS score,
                   row_number() OVER (
                       PARTITION BY c.qid
                       ORDER BY 0.5 * c.rel
                                - 0.5 * list_dot_product(c.emb::DOUBLE[], p.emb::DOUBLE[])
                                    DESC,
                                c.vec_id ASC) AS r
            FROM cands c JOIN p1 p ON c.qid = p.qid AND c.vec_id != p.vec_id
        ) WHERE r = 1
    ),
    p3 AS (
        SELECT qid, vec_id, score FROM (
            SELECT c.qid, c.vec_id,
                   0.5 * c.rel - 0.5 * greatest(
                       list_dot_product(c.emb::DOUBLE[], a.emb::DOUBLE[]),
                       list_dot_product(c.emb::DOUBLE[], b.emb::DOUBLE[])) AS score,
                   row_number() OVER (
                       PARTITION BY c.qid
                       ORDER BY 0.5 * c.rel - 0.5 * greatest(
                                    list_dot_product(c.emb::DOUBLE[], a.emb::DOUBLE[]),
                                    list_dot_product(c.emb::DOUBLE[], b.emb::DOUBLE[]))
                                    DESC,
                                c.vec_id ASC) AS r
            FROM cands c
            JOIN p1 a ON c.qid = a.qid AND c.vec_id != a.vec_id
            JOIN p2 b ON c.qid = b.qid AND c.vec_id != b.vec_id
        ) WHERE r = 1
    )
    SELECT qid, 1 AS rank, vec_id, round(rel, 4) + 0.0 AS score FROM p1
    UNION ALL SELECT qid, 2, vec_id, round(score, 4) + 0.0 FROM p2
    UNION ALL SELECT qid, 3, vec_id, round(score, 4) + 0.0 FROM p3
    """,
    tags=("llm", "similarity", "eval"),
)
def eval_mmr_diversify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-marginal-relevance re-ranking — the diversity stage between
    retrieval and the context window: pure top-k returns near-duplicates
    of one passage; MMR greedily picks argmax of
    lambda*relevance − (1−lambda)*max-similarity-to-already-picked, so
    the second and third picks trade raw score for coverage. Unrolled to
    three picks (the greedy recursion made explicit — the same
    unrolled-iteration discipline as sim_ivf_kmeans / graph_kcore's
    oracle), lambda = 0.5 exactly.

    Pick determinism is bit-exact, not rounded: rel and every
    candidate-to-pick similarity use the zip_with fold ≡
    list_dot_product (rule 9), and 0.5*x − 0.5*y is the same IEEE
    arithmetic in both engines, so every argmax resolves identically
    (vec_id tiebreak for true ties); only the displayed scores round.

    Scale: stage 1 is sim_topk's broadcast-query scan, run ONCE — the
    candidate set (≤{MMR_C}·|Q| rows) is eagerly checkpointed, because
    three consumers (pick 1, score-2, score-3) would otherwise each
    re-execute the corpus scan (measured 11.4 → ~2 s at sf0.1); each
    pick is then a per-qid window over ≤{MMR_C} rows decorated by a
    1-row-per-qid broadcast join — the diversifier never touches the
    corpus again (sim_rerank's candidate-set contract, applied twice
    more)."""
    from ..session import ensure_checkpoint_dir

    e = load(spark, sf_dir, "embeddings")
    ensure_checkpoint_dir(spark)
    q = e.filter(F.col("vec_id") < MMR_NQUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("q_emb")
    )
    w_rel = Window.partitionBy("qid").orderBy(F.col("rel").desc(), F.col("vec_id").asc())
    cands = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid", "vec_id", F.col("embedding").alias("emb"),
            dot(F.col("q_emb"), F.col("embedding")).alias("rel"),
        )
        .withColumn("r", F.row_number().over(w_rel))
        .filter(F.col("r") <= MMR_C)
        .drop("r")
        .checkpoint(eager=True)
    )
    p1 = (
        cands.withColumn("r", F.row_number().over(w_rel))
        .filter(F.col("r") == 1)
        .select("qid", F.col("vec_id").alias("p1_id"), F.col("emb").alias("p1_emb"),
                F.col("rel").alias("p1_rel"))
    )
    s2 = (
        cands.join(F.broadcast(p1), "qid")
        .filter(F.col("vec_id") != F.col("p1_id"))
        .select(
            "qid", "vec_id", "emb",
            (0.5 * F.col("rel") - 0.5 * dot_d(
                F.col("emb").cast("array<double>"), F.col("p1_emb").cast("array<double>")
            )).alias("score"),
        )
    )
    w_s = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("vec_id").asc())
    p2 = (
        s2.withColumn("r", F.row_number().over(w_s))
        .filter(F.col("r") == 1)
        .select("qid", F.col("vec_id").alias("p2_id"), F.col("emb").alias("p2_emb"),
                F.col("score").alias("p2_score"))
    )
    s3 = (
        cands.join(F.broadcast(p1), "qid")
        .join(F.broadcast(p2.select("qid", "p2_id", "p2_emb")), "qid")
        .filter((F.col("vec_id") != F.col("p1_id")) & (F.col("vec_id") != F.col("p2_id")))
        .select(
            "qid", "vec_id",
            (0.5 * F.col("rel") - 0.5 * F.greatest(
                dot_d(F.col("emb").cast("array<double>"), F.col("p1_emb").cast("array<double>")),
                dot_d(F.col("emb").cast("array<double>"), F.col("p2_emb").cast("array<double>")),
            )).alias("score"),
        )
    )
    p3 = s3.withColumn("r", F.row_number().over(w_s)).filter(F.col("r") == 1)
    out1 = p1.select(
        "qid", F.lit(1).alias("rank"), F.col("p1_id").alias("vec_id"),
        (F.round("p1_rel", 4) + F.lit(0.0)).alias("score"),
    )
    out2 = p2.select(
        "qid", F.lit(2).alias("rank"), F.col("p2_id").alias("vec_id"),
        (F.round("p2_score", 4) + F.lit(0.0)).alias("score"),
    )
    out3 = p3.select(
        "qid", F.lit(3).alias("rank"), "vec_id",
        (F.round("score", 4) + F.lit(0.0)).alias("score"),
    )
    return out1.unionByName(out2).unionByName(out3)


@query(
    "embed_centroid_drift",
    oracle="""
    WITH expanded AS (
        SELECT label, vec_id % 2 AS snap, d.i AS dim,
               embedding[d.i + 1]::DOUBLE AS x
        FROM embeddings, range(64) d(i)
    ),
    cents AS (
        SELECT label, dim,
               avg(CASE WHEN snap = 0 THEN x END) AS c_ref,
               avg(CASE WHEN snap = 1 THEN x END) AS c_cur,
               count(CASE WHEN snap = 0 THEN 1 END)::BIGINT AS n_ref,
               count(CASE WHEN snap = 1 THEN 1 END)::BIGINT AS n_cur
        FROM expanded GROUP BY label, dim
    )
    SELECT label,
           (max(n_ref))::BIGINT AS n_ref,
           (max(n_cur))::BIGINT AS n_cur,
           round(sqrt(sum((c_ref - c_cur) * (c_ref - c_cur))), 6) + 0.0 AS l2_drift,
           round(sum(c_ref * c_cur)
                 / nullif(sqrt(sum(c_ref * c_ref)) * sqrt(sum(c_cur * c_cur)), 0),
                 6) + 0.0 AS cos_sim
    FROM cents GROUP BY label
    """,
    tags=("llm", "embedding", "stats"),
)
def embed_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space drift monitor — per-label centroid displacement
    between two corpus snapshots (even/odd vec_id, the PSI/JSD split
    convention applied to VECTORS): corpus_drift_psi watches a scalar
    histogram, text_jsd_drift watches token mass, this watches where the
    REPRESENTATIONS moved — the alarm that fires when an upstream
    encoder/domain shift changes geometry while lengths and vocabulary
    look stable. Emits L2 displacement and centroid cosine per label;
    a cosine well below 1 on stable labels means re-index before any
    ANN threshold (sim_topk_ann's buckets, dedup_embed's LSH) is
    trusted.

    Shape: ONE posexplode-style expand (vector → 64 dim rows) feeding a
    single conditional-avg partial agg per (label, dim) — snapshots are
    CASE counts in one pass, never a self-join — then the 64-row-per-
    label distance fold. Centroid components are order-dependent float
    means → aggregate-level round (rule 6) with the -0.0 guard;
    divisions nullif-guarded (a snapshot-empty label yields NULL cosine,
    not a crash).

    At 100 TB: the expand is map-side ×64 with immediate combine (the
    embed_random_projection contract); per-(label, dim) cells are the
    only shuffle — |labels|·64 rows regardless of corpus size."""
    e = load(spark, sf_dir, "embeddings")
    expanded = e.select(
        "label",
        (F.col("vec_id") % 2).alias("snap"),
        F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "x"),
    )
    cents = expanded.groupBy("label", "dim").agg(
        F.avg(F.when(F.col("snap") == 0, F.col("x"))).alias("c_ref"),
        F.avg(F.when(F.col("snap") == 1, F.col("x"))).alias("c_cur"),
        F.count(F.when(F.col("snap") == 0, 1)).alias("n_ref"),
        F.count(F.when(F.col("snap") == 1, 1)).alias("n_cur"),
    )
    return cents.groupBy("label").agg(
        F.max("n_ref").alias("n_ref"),
        F.max("n_cur").alias("n_cur"),
        (
            F.round(
                F.sqrt(F.sum((F.col("c_ref") - F.col("c_cur")) * (F.col("c_ref") - F.col("c_cur")))),
                6,
            )
            + F.lit(0.0)
        ).alias("l2_drift"),
        (
            F.round(
                F.sum(F.col("c_ref") * F.col("c_cur"))
                / F.nullif(
                    F.sqrt(F.sum(F.col("c_ref") * F.col("c_ref")))
                    * F.sqrt(F.sum(F.col("c_cur") * F.col("c_cur"))),
                    F.lit(0.0),
                ),
                6,
            )
            + F.lit(0.0)
        ).alias("cos_sim"),
    )


# --- round 8: HITS hubs & authorities ---------------------------------------


@query(
    "graph_hits",
    oracle=f"""
    WITH pairs AS MATERIALIZED (
        SELECT a.vec_id AS src, b.vec_id AS dst
        FROM embeddings a
        JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
              >= {SIM_PAIRS_TAU}
    ),
    nodes AS MATERIALIZED (
        SELECT src AS id FROM pairs UNION SELECT dst FROM pairs
    ),
    a1 AS MATERIALIZED (
        SELECT dst AS id, count(*)::DOUBLE AS s FROM pairs GROUP BY dst
    ),
    a1n AS MATERIALIZED (
        SELECT id, s / (SELECT sum(s) FROM a1) AS s FROM a1
    ),
    h1 AS MATERIALIZED (
        SELECT p.src AS id, sum(a.s) AS s FROM pairs p JOIN a1n a ON p.dst = a.id
        GROUP BY p.src
    ),
    h1n AS MATERIALIZED (
        SELECT id, s / (SELECT sum(s) FROM h1) AS s FROM h1
    ),
    a2 AS MATERIALIZED (
        SELECT p.dst AS id, sum(h.s) AS s FROM pairs p JOIN h1n h ON p.src = h.id
        GROUP BY p.dst
    ),
    a2n AS MATERIALIZED (
        SELECT id, s / (SELECT sum(s) FROM a2) AS s FROM a2
    ),
    h2 AS MATERIALIZED (
        SELECT p.src AS id, sum(a.s) AS s FROM pairs p JOIN a2n a ON p.dst = a.id
        GROUP BY p.src
    ),
    h2n AS (
        SELECT id, s / (SELECT sum(s) FROM h2) AS s FROM h2
    )
    SELECT n.id AS vec_id,
           round(coalesce(h.s, 0), 6) AS hub,
           round(coalesce(a.s, 0), 6) AS authority
    FROM nodes n
    LEFT JOIN h2n h ON n.id = h.id
    LEFT JOIN a2n a ON n.id = a.id
    """,
    tags=("llm", "graph"),
)
def graph_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS (Kleinberg's hubs & authorities) over the similarity graph,
    DIRECTED low-id → high-id — the fourth iterative-centrality family
    after CC / PageRank / label propagation, and the one that
    distinguishes the two ROLES an asymmetric relation induces: on a
    citation-shaped edge set, a hub points at many good authorities, an
    authority is pointed at by many good hubs (on the symmetrized graph
    the two scores collapse — the id-ordered orientation is what keeps
    them distinct, the same deterministic orientation dedup keeps for its
    keeper rule). Two mutual-reinforcement rounds UNROLLED declaratively
    (the pagerank discipline): each half-step is edges ⋈ scores (one
    shuffle on the join side's key) → partial-agg sum, followed by L1
    normalization against a broadcast 1-row total — never an N×N matrix,
    and the global sum is the only driver-sized scalar per half-step.

    Twin: the identical chain as MATERIALIZED CTEs (rule 24 — each level
    is referenced by the next step AND its normalizer, so default inlining
    would re-expand the pairs scan 2^levels times). Scores are rounded to
    6 dp (rule 6/8: per-node sums fold in engine-specific order; the
    normalized magnitudes sit far above the 1e-6 cell). Nodes missing a
    role (no out-edges → hub 0, no in-edges → authority 0) are restored
    by the node-set left join so the output covers every graph member.

    At 100 TB: same cost model as graph_pagerank — per-iteration one
    shuffle keyed by src (or dst), partial aggregation map-side, scores
    checkpointed between rounds in the to-convergence variant; the edge
    list comes from the session memo (sim_pair_edges), so the expensive
    candidate-pair GEMM is paid once per session, not per consumer."""
    from ..session import ensure_checkpoint_dir

    ensure_checkpoint_dir(spark)
    pairs = sim_pair_edges(spark, sf_dir).select(
        F.col("vec_a").alias("src"), F.col("vec_b").alias("dst")
    )
    nodes = (
        pairs.select(F.col("src").alias("id"))
        .unionByName(pairs.select(F.col("dst").alias("id")))
        .distinct()
    )

    def l1(df: DataFrame) -> DataFrame:
        # Eager checkpoint per half-step (rule 24's Spark half, the
        # graph_kcore discipline): each level is referenced TWICE (its
        # normalizer and the next join), and without truncation the
        # recomputed subtree doubles per level — the first cut of this op
        # planned 109 exchanges / 46 scans for two iterations; with the
        # per-level checkpoint the audit is one exchange per half-step.
        df = df.checkpoint(eager=True)
        total = df.agg(F.sum("s").alias("tot"))
        return df.crossJoin(F.broadcast(total)).select(
            "id", (F.col("s") / F.col("tot")).alias("s")
        )

    a1 = pairs.groupBy(F.col("dst").alias("id")).agg(
        F.count(F.lit(1)).cast("double").alias("s")
    )
    a1n = l1(a1)
    h1 = (
        pairs.join(a1n.withColumnRenamed("id", "dst"), "dst")
        .groupBy(F.col("src").alias("id"))
        .agg(F.sum("s").alias("s"))
    )
    h1n = l1(h1)
    a2 = (
        pairs.join(h1n.withColumnRenamed("id", "src"), "src")
        .groupBy(F.col("dst").alias("id"))
        .agg(F.sum("s").alias("s"))
    )
    a2n = l1(a2)
    h2 = (
        pairs.join(a2n.withColumnRenamed("id", "dst"), "dst")
        .groupBy(F.col("src").alias("id"))
        .agg(F.sum("s").alias("s"))
    )
    h2n = l1(h2)
    return (
        nodes.join(h2n.withColumnRenamed("id", "hid"), nodes.id == F.col("hid"), "left")
        .join(a2n.withColumnRenamed("id", "aid").withColumnRenamed("s", "sa"),
              nodes.id == F.col("aid"), "left")
        .select(
            F.col("id").alias("vec_id"),
            F.round(F.coalesce(F.col("s"), F.lit(0.0)), 6).alias("hub"),
            F.round(F.coalesce(F.col("sa"), F.lit(0.0)), 6).alias("authority"),
        )
    )


# --- round 8: partition modularity -------------------------------------------


@query(
    "graph_modularity",
    oracle=f"""
    WITH pairs AS MATERIALIZED (
        SELECT a.vec_id AS va, b.vec_id AS vb,
               a.label AS la, b.label AS lb
        FROM embeddings a
        JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
              >= {SIM_PAIRS_TAU}
    ),
    m AS (SELECT count(*)::BIGINT AS m FROM pairs),
    deg AS (
        SELECT id, label, count(*)::BIGINT AS d FROM (
            SELECT va AS id, la AS label FROM pairs
            UNION ALL SELECT vb, lb FROM pairs
        ) GROUP BY id, label
    ),
    per_label AS (
        SELECT label,
               count(*)::BIGINT AS n_nodes,
               sum(d)::BIGINT AS d_tot
        FROM deg GROUP BY label
    ),
    within AS (
        SELECT la AS label, count(*)::BIGINT AS e_in
        FROM pairs WHERE la = lb GROUP BY la
    )
    SELECT p.label,
           p.n_nodes,
           coalesce(w.e_in, 0)::BIGINT AS e_within,
           p.d_tot,
           (coalesce(w.e_in, 0) * 1000000 // m.m)::BIGINT AS e_frac_ppm,
           (p.d_tot * p.d_tot * 1000000 // (4 * m.m * m.m))::BIGINT
               AS expected_ppm,
           (coalesce(w.e_in, 0) * 1000000 // m.m
            - p.d_tot * p.d_tot * 1000000 // (4 * m.m * m.m))::BIGINT
               AS q_contrib_ppm
    FROM per_label p
    LEFT JOIN within w ON p.label = w.label
    CROSS JOIN m
    """,
    tags=("llm", "graph"),
)
def graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman MODULARITY of a partition on the similarity graph — the
    quality score that closes the community-detection loop: CC /
    label-propagation / k-core PRODUCE partitions, modularity JUDGES one
    (Q = Σ_c [e_c/m − (d_c/2m)²]; Q near 0 ⇒ no better than random
    wiring, toward 1 ⇒ strong community structure). IMPORTANT LIMITATION
    (ADVICE r8 item 2): the audited partition is the fixture's
    ground-truth label column, which is ALSO sim_pair_edges' blocking
    key — every memoized edge is within-label by construction, so
    e_within always sums to m and the within-edge term is degenerate
    (e_frac_ppm partitions 1e6 across labels; no cross-community edges
    can exist). What the op genuinely measures on this graph is the
    DEGREE-BALANCE term: how evenly each label's edge mass matches its
    share of total degree. To audit an arbitrary partition (e.g.
    label-propagation output) at 100 TB, feed edges from an unblocked
    candidate generator (dedup_embed_bandor's band-OR pairs) — the
    algebra below is partition-agnostic; only this fixture's edge list
    is label-blocked.

    Exactness: edge counts, per-label degree totals, and m are integers
    off the memoized edge list; both Q terms ship as integer ppm via
    single floor divisions (rule 25 — the (d/2m)² term multiplies out to
    d²·1e6 div 4m², all BIGINT). Stated overflow bound: d_tot ≤ 2m, so
    d_tot²·1e6 ≤ 4m²·1e6, which must stay under 2^63 — exact for
    m < ~1.5e6 edges (sf0.1: m ≈ 1.25e3, three orders inside); beyond
    it Spark (ANSI off) wraps silently while DuckDB errors loudly, so
    the twin can never silently diverge. One more caveat stated:
    per-label floors mean Σ q_contrib_ppm can differ from a float Q by
    < |labels| ppm — the price of hash-exact cross-engine rows,
    documented not hidden.

    Plan: edges from the session memo (one checkpoint scan), a unioned
    degree rollup, two label-keyed partial aggs, a broadcast 1-row m."""
    pairs = sim_pair_edges(spark, sf_dir).select("vec_a", "vec_b", "label")
    edges = pairs.select(
        F.col("vec_a").alias("id"), F.col("label").alias("lab")
    ).unionByName(pairs.select(F.col("vec_b").alias("id"), F.col("label").alias("lab")))
    m_df = pairs.agg(F.count(F.lit(1)).alias("m"))
    deg = edges.groupBy("id", "lab").agg(F.count(F.lit(1)).alias("d"))
    per_label = deg.groupBy("lab").agg(
        F.count(F.lit(1)).alias("n_nodes"), F.sum("d").alias("d_tot")
    )
    within = pairs.groupBy("label").agg(F.count(F.lit(1)).alias("e_in"))
    return (
        per_label.join(within, per_label.lab == within.label, "left")
        .crossJoin(F.broadcast(m_df))
        .select(
            F.col("lab").alias("label"),
            "n_nodes",
            F.coalesce(F.col("e_in"), F.lit(0)).alias("e_within"),
            "d_tot",
            F.expr("coalesce(e_in, 0) * 1000000 div m").alias("e_frac_ppm"),
            F.expr("d_tot * d_tot * 1000000 div (4 * m * m)").alias("expected_ppm"),
            F.expr(
                "coalesce(e_in, 0) * 1000000 div m"
                " - d_tot * d_tot * 1000000 div (4 * m * m)"
            ).alias("q_contrib_ppm"),
        )
    )


# --- round 9: link prediction over the similarity graph ----------------------


@query(
    "graph_link_prediction",
    oracle=f"""
    WITH pairs AS MATERIALIZED (
        SELECT a.vec_id AS va, b.vec_id AS vb, a.label AS label
        FROM embeddings a
        JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
              >= {SIM_PAIRS_TAU}
    ),
    edges AS (
        SELECT label, va AS src, vb AS dst FROM pairs
        UNION ALL SELECT label, vb, va FROM pairs
    ),
    deg AS (SELECT label, src AS id, count(*)::BIGINT AS d FROM edges GROUP BY 1, 2),
    wedges AS (
        SELECT e1.label, e1.src AS a, e2.src AS b, e1.dst AS z
        FROM edges e1 JOIN edges e2 ON e1.label = e2.label AND e1.dst = e2.dst
        WHERE e1.src < e2.src
    ),
    nonadj AS (
        SELECT w.label, w.a, w.b, w.z
        FROM wedges w
        LEFT JOIN pairs p ON w.a = p.va AND w.b = p.vb
        WHERE p.va IS NULL
    ),
    scored AS (
        SELECT n.label, n.a, n.b,
               count(*)::BIGINT AS cn,
               round(sum(1.0 / ln(d.d)), 6) + 0.0 AS adamic_adar
        FROM nonadj n JOIN deg d ON n.label = d.label AND n.z = d.id
        GROUP BY n.label, n.a, n.b
    ),
    directed AS (
        SELECT a AS node, b AS predicted, cn, adamic_adar FROM scored
        UNION ALL SELECT b, a, cn, adamic_adar FROM scored
    )
    SELECT node, predicted, cn, adamic_adar
    FROM (
        SELECT *, row_number() OVER (
                   PARTITION BY node ORDER BY cn DESC, predicted ASC
               ) AS rn
        FROM directed
    ) z WHERE rn = 1
    """,
    tags=("llm", "graph", "similarity"),
)
def graph_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LINK PREDICTION over the similarity graph — the graph family's
    tenth primitive, and the one that looks FORWARD: for every node, the
    best NON-ADJACENT partner by shared-neighbor evidence (common-
    neighbour count, with Adamic-Adar — Σ 1/ln(deg z), rarer shared
    neighbors weigh more — reported alongside). graph_jaccard_neighbors
    scores all wedge pairs including existing edges; this op anti-joins
    the edge list away, leaving exactly the candidate pairs a
    dedup/linkage reviewer has NOT yet seen — 'these two documents match
    the same third documents but never matched each other', the
    second-order recall recovery for the near-dup pipeline.

    Determinism: ranking uses INTEGER evidence only (cn desc, partner id
    asc — rule 10); the float Adamic-Adar is reported, never ranked on,
    so the argmax cannot tie on a last ulp (the eval_ab_cuped lesson one
    op earlier). AA's 1/ln(d) is a shared expression tree over exact
    integer degrees, rounded 6dp at the aggregate (rules 8/9; d >= 2 for
    any shared neighbor, so ln > 0).

    Shape: wedge join on (label, dst) — Σ deg² like the triangle/jaccard
    ops, never all-pairs; one anti-join against the pair list; per-pair
    partial agg; per-node argmax window. Edges from the session memo."""
    p = sim_pair_edges(spark, sf_dir)
    edges = p.select(
        "label", F.col("vec_a").alias("src"), F.col("vec_b").alias("dst")
    ).unionAll(p.select("label", F.col("vec_b").alias("src"), F.col("vec_a").alias("dst")))
    deg = edges.groupBy("label", F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("d")
    )
    e1 = edges.select("label", F.col("src").alias("a"), "dst")
    e2 = edges.select("label", F.col("src").alias("b"), "dst")
    wedges = e1.join(e2, ["label", "dst"]).filter(F.col("a") < F.col("b"))
    nonadj = wedges.join(
        p.select(F.col("vec_a").alias("a"), F.col("vec_b").alias("b")),
        ["a", "b"],
        "left_anti",
    )
    scored = (
        nonadj.join(
            deg,
            (nonadj.label == deg.label) & (nonadj.dst == deg.id),
        )
        .groupBy(nonadj.label, "a", "b")
        .agg(
            F.count(F.lit(1)).alias("cn"),
            (F.round(F.sum(1.0 / F.log(F.col("d"))), 6) + F.lit(0.0)).alias(
                "adamic_adar"
            ),
        )
    )
    directed = scored.select(
        F.col("a").alias("node"), F.col("b").alias("predicted"), "cn", "adamic_adar"
    ).unionByName(
        scored.select(
            F.col("b").alias("node"), F.col("a").alias("predicted"), "cn", "adamic_adar"
        )
    )
    wtop = Window.partitionBy("node").orderBy(F.col("cn").desc(), F.col("predicted").asc())
    return (
        directed.withColumn("rn", F.row_number().over(wtop))
        .filter(F.col("rn") == 1)
        .select("node", "predicted", "cn", "adamic_adar")
    )


# --- round 12: personalized PageRank -------------------------------------------

PPR_SEEDS = 5        # seed set = vec_id < 5 (stated; the sim_topk query ids)
PPR_DAMPING = 0.85
PPR_ITERS = 2

_DUCK_PPR_STEP = """
    {next} AS (
        SELECT e.dst AS id,
               (CASE WHEN e.dst < {seeds} THEN (1.0 - {damping}) / {seeds}
                     ELSE 0.0 END)
               + {damping} * sum(p.pr / d.outdeg) AS pr
        FROM edges e
        JOIN {prev} p ON e.src = p.id
        JOIN deg d ON e.src = d.src
        GROUP BY e.dst
    )
"""


@query(
    "graph_ppr",
    oracle=f"""
    WITH {_DUCK_PR_EDGES},
    ppr0 AS (
        SELECT src AS id,
               CASE WHEN src < {PPR_SEEDS} THEN 1.0 / {PPR_SEEDS}
                    ELSE 0.0 END AS pr
        FROM deg
    ),
    {_DUCK_PPR_STEP.format(next="ppr1", prev="ppr0", damping=PPR_DAMPING, seeds=PPR_SEEDS)},
    {_DUCK_PPR_STEP.format(next="ppr2", prev="ppr1", damping=PPR_DAMPING, seeds=PPR_SEEDS)}
    SELECT id AS vec_id, round(pr, 6) + 0.0 AS ppr,
           (id < {PPR_SEEDS}) AS is_seed
    FROM ppr2 WHERE pr > 0
    """,
    tags=("llm", "graph", "similarity"),
)
def graph_ppr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank from a seed set — graph_pagerank's
    recommendation-mode sibling (global PR asks 'which documents are hubs
    of the whole dup graph'; PPR asks 'which documents does THIS seed
    neighborhood endorse' — the random walk restarts at the seeds, so
    mass concentrates around them and the ranking is query-conditional;
    the standard retrieval-expansion / related-documents primitive).

    Same unrolled power-iteration shape on the memoized similarity
    edges: restart vector = uniform over the PPR_SEEDS stated seed ids,
    each step one edges-join-ranks shuffle + partial-agg sum with the
    (1-d)*restart term folded in; nodes the walk never reaches are
    dropped (pr > 0, stated) so the output is neighborhood-sized, not
    corpus-sized. Twin = the same unrolled chain as CTEs (float class of
    graph_pagerank: 6dp rounding, rules 1/6/8).

    At 100 TB: identical cost to graph_pagerank per iteration (the edge
    memo is checkpointed once per session); the PPR output shrinks with
    locality instead of spanning the graph."""
    pairs = sim_pair_edges(spark, sf_dir).select("vec_a", "vec_b")
    edges = pairs.select(
        F.col("vec_a").alias("src"), F.col("vec_b").alias("dst")
    ).unionByName(
        pairs.select(F.col("vec_b").alias("src"), F.col("vec_a").alias("dst"))
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    restart = F.when(
        F.col("id") < PPR_SEEDS, F.lit((1.0 - PPR_DAMPING) / PPR_SEEDS)
    ).otherwise(F.lit(0.0))
    ranks = deg.select(
        F.col("src").alias("id"),
        F.when(
            F.col("src") < PPR_SEEDS, F.lit(1.0 / PPR_SEEDS)
        )
        .otherwise(F.lit(0.0))
        .alias("pr"),
    )
    for _ in range(PPR_ITERS):
        contrib = (
            edges.join(ranks, edges.src == ranks.id)
            .join(F.broadcast(deg), "src")
            .select("dst", (F.col("pr") / F.col("outdeg")).alias("share"))
        )
        ranks = contrib.groupBy(F.col("dst").alias("id")).agg(
            F.sum("share").alias("share_sum")
        ).select(
            "id", (restart + PPR_DAMPING * F.col("share_sum")).alias("pr")
        )
    return ranks.filter(F.col("pr") > 0).select(
        F.col("id").alias("vec_id"),
        (F.round("pr", 6) + F.lit(0.0)).alias("ppr"),
        (F.col("id") < PPR_SEEDS).alias("is_seed"),
    )
