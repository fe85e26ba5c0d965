#!/usr/bin/env python3
"""Measured scale sweep: run the heaviest registered queries at sf0.1 (1x)
and at a synthetic 10x replication of the same fixtures, and report the
wall-time ratio per query.

Why measure instead of argue: SCALE.md's design notes claim each plan is
shuffle-shaped to survive a 100x scale-up; this probe buys the first decade
of that claim with data. A query whose plan is linear in input should land
near ratio 10 (modulo fixed JVM overhead, which pushes ratios BELOW 10 for
sub-second queries); a quadratic pair-enumeration shows up as ratio >> 10
and is a scaling cliff to document or fix.

10x construction (``build_10x``): each table is replicated 10 times with
replica r's keys shifted by ``r * STRIDE`` so every replica is a
self-contained shard of the universe — join fan-outs and per-key group
sizes stay CONSTANT while key cardinality and row counts scale 10x. That is
the "more data" shape (more users, more orders, more docs), not the "same
keys, deeper groups" shape, matching how TPC-H scale factors grow.
Replica 0 is byte-identical to the original; dimension tables
(region/nation) stay fixed, as in TPC-H.

Cross-replica independence (so similarity graphs scale linearly rather than
densifying artificially):
- documents: replica r > 0 rotates each doc's token list by 17*r positions
  — in-replica near-dup structure is preserved (both members of a dup pair
  rotate identically, so their shared token runs still align) while
  cross-replica trigram overlap collapses to background noise.
- embeddings: replica r > 0 multiplies each vector by a deterministic
  per-replica ±1 diagonal (seeded sign flips per dimension). A shared
  diagonal is an isometry — every in-replica dot product is EXACTLY
  preserved, so each replica contributes an identical copy of the original
  similarity graph — while cross-replica dots are sign-scrambled.

Usage:
  python scripts/scale_probe.py build     # write /tmp/scale_probe/sf10x
  python scripts/scale_probe.py run       # time PROBE_QUERIES at 1x and 10x
  python scripts/scale_probe.py run q1,q2 # subset
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = "/tmp/scale_probe/sf10x"
REPLICAS = 10  # default decade; build_10x(mult) generalizes
STRIDE = 1_000_000  # > every key range in the sf0.1 fixtures
EMB_DIM = 64

# Structurally diverse heavy queries: scans/aggs, shuffle joins, windows,
# bounded self-joins, gram/LSH pair joins, iterative CC, global sort.
PROBE_QUERIES = [
    "agg_pricing_summary",
    "sort_multi",
    "join_multiway",
    "topk_per_group",
    "join_self",
    "trip_sessionize",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_cluster",
    "dedup_cluster_pd",
    "dedup_embed_cluster",
    "dedup_embed_bandor",
    "sim_pairs",
    "text_tfidf",
    "graph_pagerank",
    "corpus_dedup_pipeline",
    "resample_interp",
    # round 7: sketches / spatio-temporal / histogram quantiles
    "agg_countmin",
    "geo_dbscan_grid",
    "geo_cotravel",
    "agg_quantile_histogram",
    "geo_dwell_segments",
    # round 8: deletion-neighborhood linkage, directed HITS, SAX words,
    # preference-pair windows, global-rank lift deciles, log-bucket sketch
    "er_record_linkage",
    "graph_hits",
    "ts_sax",
    "corpus_preference_pairs",
    "eval_lift_table",
    "agg_log_histogram_quantile",
    "stats_permutation_test",
    "ts_changepoint_binseg",
    "mm_audio_energy",
    "sink_parquet_bloom",
    "corpus_curriculum_order",
    "text_bpe_train",
]


def _signs(r: int) -> list[int]:
    """Deterministic ±1 diagonal for replica r (md5-seeded, no random)."""
    out = []
    for j in range(EMB_DIM):
        h = hashlib.md5(f"replica{r}dim{j}".encode()).digest()[0]
        out.append(1 if h % 2 == 0 else -1)
    return out


def build_10x(replicas: int = REPLICAS, out: str | None = None) -> None:
    """Write a `replicas`x key-shifted replication to out (default OUT).
    replicas=100 gives the second measured decade (sf~10: 60M lineitem
    rows); key ranges stay < STRIDE so shifts never collide."""
    import duckdb

    out = out or OUT
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")

    def src(t: str) -> str:
        return f"read_parquet('{BASE}/{t}.parquet')"

    def copy(sql: str, t: str) -> None:
        con.execute(f"COPY ({sql}) TO '{out}/{t}.parquet' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')").fetchone()[0]
        print(f"  {t}: {n} rows", file=sys.stderr)

    # Dimension tables stay fixed (TPC-H convention).
    for t in ("region", "nation"):
        copy(f"SELECT * FROM {src(t)}", t)

    # customer: names are REGENERATED from the shifted key (TPC-H derives
    # c_name from c_custkey), so name-based operators (er_record_linkage)
    # see genuinely new customers instead of 10 byte-identical name copies
    # whose deletion neighborhoods would cross-match replicas artificially.
    copy(
        f"""SELECT (c_custkey + r * {STRIDE})::BIGINT AS c_custkey,
                   CASE WHEN r = 0 THEN c_name
                        ELSE 'Customer#' || lpad((c_custkey + r * {STRIDE})::VARCHAR, 9, '0')
                   END AS c_name,
                   c_nationkey, c_acctbal, c_mktsegment
            FROM {src('customer')}, range({replicas}) t(r)""",
        "customer",
    )
    copy(
        f"""SELECT (s_suppkey + r * {STRIDE})::BIGINT AS s_suppkey, s_name,
                   s_nationkey, s_acctbal
            FROM {src('supplier')}, range({replicas}) t(r)""",
        "supplier",
    )
    copy(
        f"""SELECT (p_partkey + r * {STRIDE})::BIGINT AS p_partkey, p_name,
                   p_brand, p_type, p_size, p_retailprice
            FROM {src('part')}, range({replicas}) t(r)""",
        "part",
    )
    copy(
        f"""SELECT (o_orderkey + r * {STRIDE})::BIGINT AS o_orderkey,
                   (o_custkey + r * {STRIDE})::BIGINT AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM {src('orders')}, range({replicas}) t(r)""",
        "orders",
    )
    copy(
        f"""SELECT (l_orderkey + r * {STRIDE})::BIGINT AS l_orderkey,
                   (l_partkey + r * {STRIDE})::BIGINT AS l_partkey,
                   (l_suppkey + r * {STRIDE})::BIGINT AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount,
                   l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM {src('lineitem')}, range({replicas}) t(r)""",
        "lineitem",
    )
    copy(
        f"""SELECT (event_id + r * {STRIDE})::BIGINT AS event_id, ts,
                   (user_id + r * {STRIDE})::BIGINT AS user_id,
                   event_type, value, props
            FROM {src('events')}, range({replicas}) t(r)""",
        "events",
    )
    # documents: rotate tokens by 17*r for r > 0 (replica 0 = original).
    copy(
        f"""WITH base AS (
                SELECT doc_id, text, lang, source, n_chars,
                       string_split(text, ' ') AS toks, r
                FROM {src('documents')}, range({replicas}) t(r)
            )
            SELECT (doc_id + r * {STRIDE})::BIGINT AS doc_id,
                   CASE WHEN r = 0 THEN text
                        ELSE array_to_string(
                            list_slice(toks, ((17 * r) % len(toks)) + 1, len(toks))
                            || list_slice(toks, 1, (17 * r) % len(toks)), ' ')
                   END AS text,
                   lang, source,
                   CASE WHEN r = 0 THEN n_chars
                        ELSE length(array_to_string(
                            list_slice(toks, ((17 * r) % len(toks)) + 1, len(toks))
                            || list_slice(toks, 1, (17 * r) % len(toks)), ' '))::BIGINT
                   END AS n_chars
            FROM base""",
        "documents",
    )
    # embeddings: per-replica ±1 diagonal (exact in-replica isometry).
    signs_rows = ", ".join(
        f"({r}, {_signs(r)}::DOUBLE[])" for r in range(replicas)
    )
    copy(
        f"""WITH signs(r, s) AS (VALUES {signs_rows})
            SELECT (vec_id + signs.r * {STRIDE})::BIGINT AS vec_id,
                   CASE WHEN signs.r = 0 THEN embedding
                        ELSE list_transform(generate_series(1, {EMB_DIM}),
                                            i -> (embedding[i] * s[i])::FLOAT)
                   END::FLOAT[] AS embedding,
                   label
            FROM {src('embeddings')}, signs""",
        "embeddings",
    )


SKEW_OUT = "/tmp/scale_probe/skew10x"


def build_skew() -> None:
    """SKEWED variant of the 10x build — scale's other axis. Starts from the
    uniform sf10x tables and deepens a handful of keys the way production
    data actually skews:
    - events: one hot user (user_id 7) gains 200k extra events (copies of
      replica-0 events at fresh event_ids) — a fleet tracker gone chatty.
    - lineitem: one hot order key inherits 300k extra line items — the
      join-key skew case for orders⋈lineitem.
    - documents: 500 rotated near-copies of one doc — a boilerplate
      template, the dup-cluster blowup case for gram joins.
    - embeddings: 3000 exact copies of one vector — a mode-collapsed
      embedding, the LSH-bucket hot-spot case.
    Uniform-vs-skew wall-time ratio per query quantifies which operators
    tolerate skew as-is (AQE/salting engages) and which pay linearly in
    the hot key's depth."""
    import duckdb

    os.makedirs(SKEW_OUT, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")

    def copy(sql: str, t: str) -> None:
        con.execute(f"COPY ({sql}) TO '{SKEW_OUT}/{t}.parquet' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM read_parquet('{SKEW_OUT}/{t}.parquet')").fetchone()[0]
        print(f"  {t}: {n} rows", file=sys.stderr)

    for t in ("region", "nation", "customer", "supplier", "part", "orders"):
        copy(f"SELECT * FROM read_parquet('{OUT}/{t}.parquet')", t)

    copy(
        f"""SELECT * FROM read_parquet('{OUT}/events.parquet')
            UNION ALL
            SELECT (50 * {STRIDE} + gen + r * 100000)::BIGINT AS event_id,
                   ts, 7::BIGINT AS user_id, event_type, value, props
            FROM (SELECT *, row_number() OVER (ORDER BY event_id) AS gen
                  FROM read_parquet('{BASE}/events.parquet')
                  ORDER BY event_id LIMIT 100000),
                 range(2) g(r)""",
        "events",
    )
    hot_ok = con.execute(
        f"SELECT l_orderkey FROM read_parquet('{OUT}/lineitem.parquet') LIMIT 1"
    ).fetchone()[0]
    copy(
        f"""SELECT * FROM read_parquet('{OUT}/lineitem.parquet')
            UNION ALL
            (SELECT {hot_ok}::BIGINT AS l_orderkey, l_partkey, l_suppkey,
                    l_linenumber, l_quantity, l_extendedprice, l_discount,
                    l_tax, l_returnflag, l_linestatus, l_shipdate
             FROM read_parquet('{BASE}/lineitem.parquet')
             ORDER BY l_orderkey, l_linenumber, l_partkey LIMIT 300000)""",
        "lineitem",
    )
    copy(
        f"""WITH tpl AS (
                SELECT string_split(text, ' ') AS toks, lang, source
                FROM read_parquet('{BASE}/documents.parquet')
                WHERE doc_id = 42
            )
            SELECT * FROM read_parquet('{OUT}/documents.parquet')
            UNION ALL
            SELECT (60 * {STRIDE} + i)::BIGINT AS doc_id,
                   array_to_string(
                       list_slice(toks, (i % len(toks)) + 1, len(toks))
                       || list_slice(toks, 1, i % len(toks)), ' ') AS text,
                   lang, source,
                   length(array_to_string(
                       list_slice(toks, (i % len(toks)) + 1, len(toks))
                       || list_slice(toks, 1, i % len(toks)), ' '))::BIGINT AS n_chars
            FROM tpl, range(500) t(i)""",
        "documents",
    )
    copy(
        f"""SELECT * FROM read_parquet('{OUT}/embeddings.parquet')
            UNION ALL
            SELECT (70 * {STRIDE} + i)::BIGINT AS vec_id, embedding, label
            FROM read_parquet('{BASE}/embeddings.parquet'), range(3000) t(i)
            WHERE vec_id = 11""",
        "embeddings",
    )


def run_pair(names: list[str], dir_a: str, dir_b: str, tag_a: str, tag_b: str) -> None:
    """Time each query against two fixture dirs in one warm session."""
    import rvi_big_data_api_spark as engine

    spark = engine.get_spark("rvi-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = engine.queries()
    qs["agg_basic"](spark, BASE).count()
    results: dict[str, dict] = {}
    for name in names:
        row: dict = {}
        try:
            for tag, sf_dir in ((tag_a, dir_a), (tag_b, dir_b)):
                t0 = time.perf_counter()
                n = qs[name](spark, sf_dir).count()
                row[tag] = round(time.perf_counter() - t0, 2)
                row["rows_" + tag] = n
            row["ratio"] = round(row[tag_b] / max(row[tag_a], 1e-9), 1)
        except Exception as exc:  # noqa: BLE001
            row["error"] = f"{type(exc).__name__}: {str(exc)[:200]}"
        results[name] = row
        print(f"  {name}: {row}", file=sys.stderr)
    print(json.dumps(results, indent=1))


def run(names: list[str]) -> None:
    import rvi_big_data_api_spark as engine

    spark = engine.get_spark("rvi-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = engine.queries()
    # Warm the JVM/codegen on an unrelated shape first.
    qs["agg_basic"](spark, BASE).count()

    results: dict[str, dict] = {}
    for name in names:
        row = {}
        for tag, sf_dir in (("t1x", BASE), ("t10x", OUT)):
            t0 = time.perf_counter()
            n = qs[name](spark, sf_dir).count()
            row[tag] = round(time.perf_counter() - t0, 2)
            row["rows_" + tag[1:]] = n
            print(f"  {name} {tag}: {row[tag]}s rows={n}", file=sys.stderr)
        row["ratio"] = round(row["t10x"] / max(row["t1x"], 1e-9), 1)
        results[name] = row
    print(json.dumps(results, indent=1))


# Quadratic-by-semantics ops (output itself is pairwise) — measured once in
# the headline sweep, excluded from the full sweep so it finishes same-day.
SWEEP_EXCLUDE = {"sim_pairs", "sim_pairs_gemm", "dedup_embed_cluster"}

# Queries whose >8x decade ratio is a RECORDED property of the op, not a
# regression — measured and adjudicated once (SCALE.md), never re-flagged.
# dedup_embed_pinned8 (né dedup_embed_scaled): the bucket width is pinned at
# 8 bits BY DESIGN (the fixture pin of dedup_embed's adaptive n_bits rule),
# so in-bucket candidate cost grows quadratically with the decade — the r8
# sweep measured 18.8x at 48x output, adjudicated in SCALE.md's round-8
# sweep refresh. The ADAPTIVE default (dedup_embed) stays under the gate.
SWEEP_ADJUDICATED = {"dedup_embed_pinned8"}

# Streaming queries pay per-trigger micro-batch latency that measures the
# harness, not the operator (same rationale as bench.py's skip list).
SKIP_PREFIXES = ("stream_", "source_stream", "sink_stream")


def run_full_sweep() -> None:
    """Every batch query at 1x and 10x in one warm session; report every
    ratio, errors included. The scale regression gate: any linear-plan query
    drifting past ~8x at 10x data is a finding."""
    import rvi_big_data_api_spark as engine

    spark = engine.get_spark("rvi-scale-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    qs = engine.queries()
    qs["agg_basic"](spark, BASE).count()

    results: dict[str, dict] = {}
    for name in sorted(qs):
        if name.startswith(SKIP_PREFIXES) or name in SWEEP_EXCLUDE:
            continue
        row: dict = {}
        try:
            for tag, sf_dir in (("t1x", BASE), ("t10x", OUT)):
                t0 = time.perf_counter()
                n = qs[name](spark, sf_dir).count()
                row[tag] = round(time.perf_counter() - t0, 2)
                row["rows_" + tag[1:]] = n
            row["ratio"] = round(row["t10x"] / max(row["t1x"], 1e-9), 1)
        except Exception as exc:  # noqa: BLE001 — record, keep sweeping
            row["error"] = f"{type(exc).__name__}: {str(exc)[:200]}"
        results[name] = row
        print(f"  {name}: {row}", file=sys.stderr)
    flagged = {
        n: r
        for n, r in results.items()
        if (r.get("ratio", 0) > 8 and n not in SWEEP_ADJUDICATED) or "error" in r
    }
    print(json.dumps({"flagged": flagged, "all": results}, indent=1))


SKEW_QUERIES = [
    # hot-user depth (window/sessionization families — per-key serial work)
    "trip_sessionize", "latest_per_key", "gap_report", "topk_per_group",
    "win_running",
    # hot join key (orders⋈lineitem)
    "join_shuffle", "agg_pricing_summary", "composite_shipping_priority",
    # dup-cluster blowup (gram joins) and LSH hot bucket
    "dedup_exact", "dedup_ngram_jaccard", "dedup_near", "dedup_embed_bandor",
    "sim_topk",
]


def run_skew() -> None:
    """Time SKEW_QUERIES on the uniform 10x tables and the skewed variant;
    the ratio isolates pure skew amplification (same row counts ±2%)."""
    import rvi_big_data_api_spark as engine

    spark = engine.get_spark("rvi-skew-probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = engine.queries()
    qs["agg_basic"](spark, BASE).count()

    results: dict[str, dict] = {}
    for name in SKEW_QUERIES:
        row: dict = {}
        try:
            for tag, sf_dir in (("uniform", OUT), ("skew", SKEW_OUT)):
                t0 = time.perf_counter()
                n = qs[name](spark, sf_dir).count()
                row[tag] = round(time.perf_counter() - t0, 2)
                row["rows_" + tag] = n
            row["amp"] = round(row["skew"] / max(row["uniform"], 1e-9), 1)
        except Exception as exc:  # noqa: BLE001
            row["error"] = f"{type(exc).__name__}: {str(exc)[:200]}"
        results[name] = row
        print(f"  {name}: {row}", file=sys.stderr)
    print(json.dumps(results, indent=1))


def run_embed_mitigation() -> None:
    """Demonstrate the signbit-bucket width fix for the measured 4-bit
    cliff: rerun the dedup_embed_cluster pipeline at 10x with 8-bit buckets
    (bucket count 16 → 256, sized so per-bucket rows at 10x match the 4-bit
    buckets at 1x) and report wall time + edge recall vs the 4-bit run."""
    import rvi_big_data_api_spark as engine
    from pyspark.sql import functions as F
    from rvi_big_data_api_spark.io import load
    from rvi_big_data_api_spark.operators.llm_dedup import (
        DEDUP_EMBED_CLUSTER_TAU,
        embed_sim_edges,
        pointer_doubling_components,
    )

    spark = engine.get_spark("rvi-scale-probe-embed")
    spark.sparkContext.setLogLevel("ERROR")
    engine.queries()["agg_basic"](spark, BASE).count()

    out: dict[str, dict] = {}
    e10 = load(spark, OUT, "embeddings")
    for bits in (4, 8):
        t0 = time.perf_counter()
        labels = pointer_doubling_components(
            spark,
            embed_sim_edges(e10, DEDUP_EMBED_CLUSTER_TAU, n_bits=bits),
            max_rounds=20,
        )
        n = labels.count()
        t = round(time.perf_counter() - t0, 2)
        n_edges = embed_sim_edges(e10, DEDUP_EMBED_CLUSTER_TAU, n_bits=bits).count()
        out[f"bits{bits}"] = {"t10x": t, "clustered_nodes": n, "edges": n_edges}
        print(f"  bits={bits}: {t}s nodes={n} edges={n_edges}", file=sys.stderr)
    print(json.dumps(out, indent=1))


STREAM_DIR = "/tmp/scale_probe/stream_events"
ROCKSDB_PROVIDER_CLS = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def _stage_stream_shards(n: int, out_dir: str, first: int = 0) -> None:
    """Write event shards [first, n) as separate parquet files, replica r's
    keys shifted by r*STRIDE (the build_10x construction, restricted to
    events): each shard is an independent slice of the universe, so state
    cardinality scales with shards while per-key state stays constant."""
    import duckdb

    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    src = os.path.join(BASE, "events.parquet")
    for r in range(first, n):
        dst = os.path.join(out_dir, f"shard_{r:03d}.parquet")
        if os.path.exists(dst):
            continue
        con.execute(
            f"""
            COPY (SELECT event_id + {r * STRIDE} AS event_id, ts,
                         user_id + {r * STRIDE} AS user_id,
                         event_type, value, props
                  FROM read_parquet('{src}'))
            TO '{dst}' (FORMAT parquet)
            """
        )


def _du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def run_streaming_decade() -> None:
    """The stateful-streaming decade (VERDICT r5 item 4): drive the RocksDB
    stateful pipeline (dropDuplicates event-id repair → per-user-per-day
    counts, the stream_stateful_rocksdb shape WITHOUT its fixture key
    filter, so state cardinality actually scales) at 1x and 10x event
    volume, recording wall time, rows/s, and on-disk state-store size; then
    a checkpoint-restart leg: add ONE more 1x shard to the 10x source and
    resume from the same checkpoint — incremental cost must track the
    increment, not the accumulated state. Changelog checkpointing is ON
    (per-batch deltas), the configuration a 100 TB deployment runs."""
    import shutil

    import pyspark.sql.functions as F

    import rvi_big_data_api_spark as engine
    from rvi_big_data_api_spark.streaming.streams import EVENTS

    spark = engine.get_spark("rvi-stream-decade")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER_CLS
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        "true",
    )

    def pipeline(src_dir: str):
        return (
            spark.readStream.schema(EVENTS)
            .parquet(src_dir)
            .dropDuplicates(["event_id"])
            .groupBy(
                "user_id",
                F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
            )
            .agg(F.count(F.lit(1)).alias("n_unique"))
        )

    def drain(src_dir: str, ckpt: str) -> dict:
        t0 = time.perf_counter()
        q = (
            pipeline(src_dir)
            .writeStream.format("noop")
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        t = time.perf_counter() - t0
        rows = sum(
            int(p["numInputRows"]) for p in (q.recentProgress or []) if p
        )
        return {
            "wall_sec": round(t, 2),
            "input_rows": rows,
            "rows_per_sec": int(rows / t) if t > 0 else None,
            "state_bytes": _du(os.path.join(ckpt, "state")),
            "n_batches": len(q.recentProgress or []),
        }

    # Warmup drain: the FIRST streaming query of a session pays one-time
    # RocksDB/JNI + streaming-runtime init (~7 s measured) that would land
    # entirely on the 1x leg and flatten the ratio; burn it on a throwaway.
    warm_src = os.path.join(STREAM_DIR, "warm")
    _stage_stream_shards(1, warm_src)
    warm_ckpt = os.path.join(STREAM_DIR, "ckpt_warm")
    shutil.rmtree(warm_ckpt, ignore_errors=True)
    drain(warm_src, warm_ckpt)

    results: dict[str, dict] = {}
    for tag, shards in (("t1x", 1), ("t10x", 10), ("t100x", 100)):
        src = os.path.join(STREAM_DIR, tag)
        _stage_stream_shards(shards, src)
        ckpt = os.path.join(STREAM_DIR, f"ckpt_{tag}")
        shutil.rmtree(ckpt, ignore_errors=True)
        results[tag] = drain(src, ckpt)
        print(f"  {tag}: {results[tag]}", file=sys.stderr)
    # checkpoint-restart leg: one extra shard into the 10x source, SAME ckpt
    src10 = os.path.join(STREAM_DIR, "t10x")
    _stage_stream_shards(11, src10, first=10)
    results["restart_plus1x"] = drain(src10, os.path.join(STREAM_DIR, "ckpt_t10x"))
    print(f"  restart_plus1x: {results['restart_plus1x']}", file=sys.stderr)
    results["ratio_10x_vs_1x"] = round(
        results["t10x"]["wall_sec"] / max(results["t1x"]["wall_sec"], 1e-9), 1
    )
    results["ratio_100x_vs_10x"] = round(
        results["t100x"]["wall_sec"] / max(results["t10x"]["wall_sec"], 1e-9), 1
    )
    results["state_ratio_10x_vs_1x"] = round(
        results["t10x"]["state_bytes"] / max(results["t1x"]["state_bytes"], 1), 1
    )
    results["state_ratio_100x_vs_10x"] = round(
        results["t100x"]["state_bytes"] / max(results["t10x"]["state_bytes"], 1), 1
    )
    print(json.dumps(results, indent=1))


def _stage_stream_time_shards(n: int, out_dir: str, first: int = 0) -> None:
    """Write event shards [first, n) TIME-shifted (shard r: ts + r*31 days,
    event_id shifted for uniqueness) — an ongoing stream where each shard is
    a later window. Unlike the key-shifted construction (whose shards all
    repeat the same event-time span, so every row after the first shard
    would be watermark-late), this lets the watermark advance shard-to-shard
    and EVICT join state: the property a stream-stream join must show at
    scale is state bounded by rate x horizon, not by total rows seen."""
    import duckdb

    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    src = os.path.join(BASE, "events.parquet")
    for r in range(first, n):
        dst = os.path.join(out_dir, f"shard_{r:03d}.parquet")
        if os.path.exists(dst):
            continue
        con.execute(
            f"""
            COPY (SELECT event_id + {r * STRIDE} AS event_id,
                         ts + INTERVAL {r * 31} DAY AS ts,
                         user_id, event_type, value, props
                  FROM read_parquet('{src}'))
            TO '{dst}' (FORMAT parquet)
            """
        )


def run_streaming_join_decade() -> None:
    """Stream-stream join state decade (VERDICT r6 item 8): drive
    stream_stream_join's exact shape — purchases x same-user clicks in the
    trailing hour, both sides watermarked 2h — over 1x / 10x time-shifted
    event volume with RocksDB + changelog checkpointing, one shard per
    micro-batch (maxFilesPerTrigger=1) so the watermark advances between
    batches. The claim under test: on-disk join state stays BOUNDED
    (rate x watermark horizon — here ~one shard's join rows) while input
    grows 10x, and wall time stays linear in rows. Then a restart leg:
    one more shard into the 10x source, same checkpoint — incremental."""
    import shutil

    import pyspark.sql.functions as F

    import rvi_big_data_api_spark as engine
    from rvi_big_data_api_spark.streaming.streams import EVENTS

    spark = engine.get_spark("rvi-streamjoin-decade")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER_CLS
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        "true",
    )

    def pipeline(src_dir: str):
        ev = (
            spark.readStream.schema(EVENTS)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )
        purchases = (
            ev.filter(F.col("event_type") == "purchase")
            .select(
                F.col("event_id").alias("purchase_id"),
                F.col("user_id").alias("p_user"),
                F.col("ts").alias("p_ts"),
            )
            .withWatermark("p_ts", "2 hours")
        )
        clicks = (
            ev.filter(F.col("event_type") == "click")
            .select(
                F.col("event_id").alias("click_id"),
                F.col("user_id").alias("c_user"),
                F.col("ts").alias("c_ts"),
            )
            .withWatermark("c_ts", "2 hours")
        )
        return purchases.join(
            clicks,
            (F.col("p_user") == F.col("c_user"))
            & (F.col("c_ts") <= F.col("p_ts"))
            & (F.col("c_ts") >= F.col("p_ts") - F.expr("interval 1 hour")),
        ).select("purchase_id", "click_id")

    def drain(src_dir: str, ckpt: str) -> dict:
        t0 = time.perf_counter()
        q = (
            pipeline(src_dir)
            .writeStream.format("noop")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        t = time.perf_counter() - t0
        prog = q.recentProgress or []
        rows = sum(int(p["numInputRows"]) for p in prog if p)
        out_rows = sum(
            int(p["sink"].get("numOutputRows", 0) or 0) for p in prog if p and p.get("sink")
        )
        # LIVE state after the final batch (stateOperators.numRowsTotal) is
        # the bounded-state claim's metric; _du over the checkpoint's state
        # dir additionally counts every RETAINED VERSION's changelog/SSTs
        # (minBatchesToRetain), i.e. it grows with batch COUNT even when
        # live state is flat — report both, read the first.
        live_rows = None
        live_bytes = None
        for p in reversed(prog):
            ops = (p or {}).get("stateOperators") or []
            if ops:
                live_rows = sum(int(o.get("numRowsTotal", 0)) for o in ops)
                live_bytes = sum(int(o.get("stateMemory", 0) or o.get("memoryUsedBytes", 0) or 0) for o in ops)
                break
        return {
            "wall_sec": round(t, 2),
            "input_rows": rows,
            "output_rows": out_rows,
            "rows_per_sec": int(rows / t) if t > 0 else None,
            "live_state_rows": live_rows,
            "live_state_bytes": live_bytes,
            "ckpt_state_bytes_all_versions": _du(os.path.join(ckpt, "state")),
            "n_batches": len(prog),
        }

    base_dir = "/tmp/scale_probe/stream_join"
    warm_src = os.path.join(base_dir, "warm")
    _stage_stream_time_shards(1, warm_src)
    warm_ckpt = os.path.join(base_dir, "ckpt_warm")
    shutil.rmtree(warm_ckpt, ignore_errors=True)
    drain(warm_src, warm_ckpt)

    results: dict[str, dict] = {}
    for tag, shards in (("t1x", 1), ("t10x", 10)):
        src = os.path.join(base_dir, tag)
        _stage_stream_time_shards(shards, src)
        ckpt = os.path.join(base_dir, f"ckpt_{tag}")
        shutil.rmtree(ckpt, ignore_errors=True)
        results[tag] = drain(src, ckpt)
        print(f"  {tag}: {results[tag]}", file=sys.stderr)
    src10 = os.path.join(base_dir, "t10x")
    _stage_stream_time_shards(11, src10, first=10)
    results["restart_plus1x"] = drain(src10, os.path.join(base_dir, "ckpt_t10x"))
    print(f"  restart_plus1x: {results['restart_plus1x']}", file=sys.stderr)
    results["wall_ratio_10x_vs_1x"] = round(
        results["t10x"]["wall_sec"] / max(results["t1x"]["wall_sec"], 1e-9), 1
    )
    results["live_state_ratio_10x_vs_1x"] = round(
        (results["t10x"]["live_state_rows"] or 0)
        / max(results["t1x"]["live_state_rows"] or 1, 1),
        2,
    )
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "run"
    if cmd == "build":
        n = int(sys.argv[2]) if len(sys.argv) > 2 else REPLICAS
        build_10x(n, f"/tmp/scale_probe/sf{n}x" if n != REPLICAS else None)
    elif cmd == "run":
        names = sys.argv[2].split(",") if len(sys.argv) > 2 else PROBE_QUERIES
        run(names)
    elif cmd == "embed":
        run_embed_mitigation()
    elif cmd == "sweep":
        run_full_sweep()
    elif cmd == "stream":
        run_streaming_decade()
    elif cmd == "streamjoin":
        run_streaming_join_decade()
    elif cmd == "build_skew":
        build_skew()
    elif cmd == "skew":
        run_skew()
    elif cmd == "run100":
        names = sys.argv[2].split(",") if len(sys.argv) > 2 else [
            q for q in PROBE_QUERIES
            if q not in ("sim_pairs", "dedup_embed_cluster")
        ]
        run_pair(names, OUT, "/tmp/scale_probe/sf100x", "t10x", "t100x")
    else:
        raise SystemExit(f"unknown command {cmd!r}")
