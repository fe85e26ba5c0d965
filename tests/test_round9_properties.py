"""Round-9 additions: cross-operator invariants and golden checks.

Same discipline as test_round7/8_properties.py: every new operator gets at
least one property that a wrong implementation would fail, checked against
either an independent pure-Python replica or a conservation law the algebra
must obey.
"""

from __future__ import annotations

import hashlib

import pytest

from rvi_big_data_api_spark.registry import REGISTRY


def _df(name, spark, sf_dir):
    return REGISTRY[name].fn(spark, sf_dir)


# --- mm_cdc_dedup: content-defined chunking ---------------------------------


def _cdc_boundaries(s: str, w: int = 8, nibble: str = "0") -> list[int]:
    """Pure-Python replica of the op's boundary rule: i in [w, len-1] is a
    boundary iff md5 of the w-byte window ENDING at i starts with `nibble`;
    len is always a boundary."""
    n = len(s)
    out = [
        i
        for i in range(w, n)
        if hashlib.md5(s[i - w : i].encode()).hexdigest()[0] == nibble
    ]
    if n >= 1:
        out.append(n)
    return out


def _cdc_chunks(s: str) -> list[tuple[int, int, str]]:
    """(start, end, content] spans from the boundary list."""
    spans, prev = [], 0
    for b in _cdc_boundaries(s):
        spans.append((prev, b, s[prev:b]))
        prev = b
    return spans


@pytest.mark.parametrize("edit_frac", [0.25, 0.5, 0.75])
def test_cdc_insertion_is_local(duck, edit_frac):
    """THE CDC property (VERDICT r8 item 5's done-gate): inserting one byte
    changes only the chunks at the edit site. Chunks ending before the edit
    are bit-identical; chunks starting >= CDC_W-1 past it survive with spans
    shifted by exactly +1; at most a handful of edit-zone chunks differ."""
    from rvi_big_data_api_spark.operators.multimodal import CDC_W

    texts = [
        r[0]
        for r in duck.execute(
            "SELECT text FROM documents WHERE length(text) > 80 "
            "ORDER BY doc_id LIMIT 12"
        ).fetchall()
    ]
    assert texts
    for s in texts:
        p = int(len(s) * edit_frac)
        s2 = s[:p] + "X" + s[p:]
        old = _cdc_chunks(s)
        new = _cdc_chunks(s2)
        new_set = set(new)
        # prefix chunks (ending at or before the edit) are untouched: every
        # boundary i <= p reads only bytes [i-W, i-1] < p
        for span in old:
            if span[1] <= p:
                assert span in new_set, (p, span)
        # suffix chunks (start boundary's window fully past the edit, i.e.
        # st - W >= p) shift by exactly +1 with identical content — the
        # property FIXED-POSITION chunking (mm_chunk_bytes) fails
        for (st, en, content) in old:
            if st >= p + CDC_W:
                assert (st + 1, en + 1, content) in new_set, (p, st, en)
        # the re-chunked zone is bounded: the non-surviving chunks span a
        # contiguous byte range no wider than two old chunks plus the window
        changed = [
            sp for sp in old if not (sp[1] <= p or sp[0] >= p + CDC_W)
        ]
        assert changed, "the chunk containing the edit must change"
        max_chunk = max(en - st for st, en, _ in old)
        zone = max(en for _, en, _ in changed) - min(st for st, _, _ in changed)
        assert zone <= 2 * max_chunk + CDC_W, (p, zone, max_chunk)
        # chunking partitions the blob on both sides
        assert "".join(c for _, _, c in new) == s2


def test_cdc_ledger_matches_python_replica(spark, sf_dir, duck):
    """Per-doc (n_chunks, n_bytes, n_dup_chunks) from the Spark op equal an
    independent pure-Python recomputation over the same corpus — the chunk
    GEOMETRY and the keep-first rule, not just row counts. n_bytes must
    reconstruct the doc exactly (chunking is a partition of the blob)."""
    rows = {
        r["doc_id"]: r
        for r in _df("mm_cdc_dedup", spark, sf_dir).collect()
    }
    docs = duck.execute(
        "SELECT doc_id, text FROM documents WHERE length(text) >= 1"
    ).fetchall()
    assert set(rows) == {d for d, _ in docs}
    # python keep-first over the whole corpus, ordered by (doc_id, start)
    first_owner: dict[str, tuple] = {}
    per_doc: dict[int, list] = {}
    for doc_id, text in sorted(docs):
        for st, en, content in _cdc_chunks(text):
            h = hashlib.md5(content.encode()).hexdigest()
            first_owner.setdefault(h, (doc_id, st))
            per_doc.setdefault(doc_id, []).append((st, en, h))
    for doc_id, text in docs:
        chunks = per_doc[doc_id]
        r = rows[doc_id]
        assert r["n_chunks"] == len(chunks), doc_id
        assert r["n_bytes"] == len(text), doc_id  # partition: bytes conserve
        n_dup = sum(1 for st, en, h in chunks if first_owner[h] != (doc_id, st))
        assert r["n_dup_chunks"] == n_dup, doc_id
        # full-duplicate docs legitimately store 0 ppm (every chunk first
        # seen in the earlier twin) — the savings CDC exists to realize
        assert 0 <= r["stored_ppm"] <= 1_000_000, doc_id


# --- text_substring_dedup: maximal repeated k-gram runs ---------------------


def test_substring_runs_superset_span_dedup(spark, sf_dir, duck):
    """VERDICT r8 item 6's done-gate: every FULL-WIDTH span text_span_dedup
    removes (rn > 1 at SPAN_W alignment) is contained in one of this op's
    runs at the same width — the aligned remover's deletions are a strict
    subset of the any-alignment detector's regions."""
    from rvi_big_data_api_spark.operators.llm_text import RUN_K, SPAN_W

    assert RUN_K == SPAN_W  # the property is only provable at equal widths
    removed = duck.execute(f"""
        WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        spans AS (
            SELECT doc_id, unnest(range(ceil(len(ts) / {SPAN_W}.0)::BIGINT)) AS pos, ts
            FROM toks
        ),
        chunks AS (
            SELECT doc_id, pos,
                   array_to_string(ts[pos * {SPAN_W} + 1 : pos * {SPAN_W} + {SPAN_W}], ' ') AS chunk
            FROM spans
        ),
        ranked AS (
            SELECT doc_id, pos, chunk,
                   row_number() OVER (PARTITION BY md5(chunk) ORDER BY doc_id, pos) AS rn
            FROM chunks
        )
        SELECT doc_id, pos FROM ranked
        WHERE rn > 1 AND len(string_split(chunk, ' ')) = {SPAN_W}
    """).fetchall()
    runs: dict[int, list] = {}
    for r in _df("text_substring_dedup", spark, sf_dir).collect():
        runs.setdefault(r["doc_id"], []).append(
            (r["run_start"], r["run_start"] + r["span_tokens"])
        )
    assert removed, "fixture has no removed full-width spans — test is vacuous"
    for doc_id, pos in removed:
        lo, hi = pos * SPAN_W, pos * SPAN_W + SPAN_W
        assert any(s <= lo and hi <= e for s, e in runs.get(doc_id, [])), (
            doc_id,
            pos,
        )


def test_substring_runs_disjoint(spark, sf_dir):
    """Runs are maximal: per doc, gram ranges are disjoint and separated by
    at least one non-duplicated gram position."""
    rows = _df("text_substring_dedup", spark, sf_dir).collect()
    per_doc: dict[int, list] = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(r)
    assert per_doc
    for doc_id, rs in per_doc.items():
        spans = sorted((r["run_start"], r["run_start"] + r["n_grams"]) for r in rs)
        for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
            assert e1 < s2, (doc_id, spans)  # disjoint gram ranges, gap >= 1


def test_substring_dedup_golden_micro_corpus(spark):
    """Golden check on an inline micro-corpus (the fixture has no EXACT
    duplicate docs, so this pins the whole-doc case): an exact-duplicate
    document collapses to ONE whole-doc run with the corpus-later twin
    marked keep=false; a doc sharing only an interior passage reports
    exactly that passage's run; a unique doc reports nothing."""
    from rvi_big_data_api_spark.operators.llm_text import RUN_K, substring_dedup_frame

    shared = " ".join(f"s{i}" for i in range(RUN_K + 3))  # 11-token passage
    docs = [
        (1, shared + " " + " ".join(f"a{i}" for i in range(10))),
        (2, shared + " " + " ".join(f"a{i}" for i in range(10))),  # exact dup of 1
        (3, " ".join(f"b{i}" for i in range(6)) + " " + shared
            + " " + " ".join(f"c{i}" for i in range(6))),          # interior share
        (4, " ".join(f"u{i}" for i in range(20))),                 # unique
    ]
    d = spark.createDataFrame(docs, "doc_id long, text string")
    rows = substring_dedup_frame(d).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    n1 = len(docs[0][1].split(" "))
    assert len(by_doc[1]) == 1 and len(by_doc[2]) == 1
    for doc_id in (1, 2):
        (r,) = by_doc[doc_id]
        assert (r["run_start"], r["span_tokens"]) == (0, n1), r
    assert by_doc[1][0]["keep"] and not by_doc[2][0]["keep"]
    # doc 3: the shared passage starts at token 6, spans RUN_K + 3 tokens
    (r3,) = by_doc[3]
    assert (r3["run_start"], r3["span_tokens"]) == (6, RUN_K + 3), r3
    assert 4 not in by_doc


# --- privacy_dp_quantile: exponential-mechanism median ----------------------


def _dpq_scores(duck):
    """Recompute every candidate's selection score in pure Python/DuckDB —
    the independent replica of the op's score expression."""
    import math

    from rvi_big_data_api_spark.operators.analytics import (
        DP_EPSILON_X1000,
        DP_MEAN_CLAMP_CENTS,
        DP_Q_BUCKET_CENTS,
        DP_Q_N_BUCKETS,
        DP_U_LATTICE,
    )

    hist = duck.execute(f"""
        SELECT event_type,
               least(greatest(floor(value * 100 + 0.5)::BIGINT, 0),
                     {DP_MEAN_CLAMP_CENTS}) // {DP_Q_BUCKET_CENTS} AS b,
               count(*) AS cnt
        FROM events GROUP BY 1, 2
    """).fetchall()
    counts: dict[str, dict[int, int]] = {}
    for et, b, cnt in hist:
        counts.setdefault(et, {})[b] = cnt
    out: dict[str, list] = {}
    for et, bc in counts.items():
        n = sum(bc.values())
        rk = 0
        for b in range(DP_Q_N_BUCKETS + 1):
            rk += bc.get(b, 0)
            seed = hashlib.md5(f"dpq:{et}:{b}".encode()).hexdigest()[:6]
            u = (int(seed, 16) + 0.5) / DP_U_LATTICE
            score = (
                -abs(2 * rk - n) * DP_EPSILON_X1000 / 4000.0
                - math.log(-math.log(u))
            )
            out.setdefault(et, []).append((score, b))
    return out


def test_dp_quantile_margin_and_concentration(spark, sf_dir, duck):
    """(1) The Gumbel-max winner's score margin over the runner-up is far
    above float noise (the sample_weighted ranking discipline — a margin
    collapse would make the argmax engine-dependent). (2) At eps=1 with
    thousands of records the mechanism concentrates: the released value's
    rank error is a tiny fraction of n — the utility the mechanism
    promises, and a strong functional check of rank/utility wiring."""
    from rvi_big_data_api_spark.operators.analytics import DP_Q_BUCKET_CENTS

    released = {
        r["event_type"]: r["dp_median_cents"]
        for r in _df("privacy_dp_quantile", spark, sf_dir).collect()
    }
    scores = _dpq_scores(duck)
    assert set(released) == set(scores)
    for et, cand in scores.items():
        ordered = sorted(cand, key=lambda t: (-t[0], t[1]))
        (s1, b1), (s2, _) = ordered[0], ordered[1]
        assert released[et] == b1 * DP_Q_BUCKET_CENTS, et
        assert s1 - s2 > 1e-6, (et, s1, s2)  # measured argmax margin
    # concentration: winner rank error <= 5% of n
    true = duck.execute("""
        SELECT event_type, count(*) AS n,
               median(least(greatest(floor(value * 100 + 0.5)::BIGINT, 0), 20000))
        FROM events GROUP BY 1
    """).fetchall()
    for et, n, med in true:
        err_cents = abs(released[et] - med)
        assert err_cents <= max(2 * DP_Q_BUCKET_CENTS, 0.1 * med + 1000), (
            et,
            released[et],
            med,
        )


def test_cdc_incremental_matches_growing_store_replica(spark, sf_dir, duck):
    """mm_cdc_incremental vs an independent Python replay of the ingest:
    base store = even docs' chunk hashes; odd docs ingest in (doc_id, s)
    order against a GROWING store (base + every previously-uploaded delta
    chunk). Per-doc reused/new chunk and byte ledgers must match exactly —
    the store-grows-during-ingest rule, not just base membership."""
    rows = {
        r["doc_id"]: r
        for r in _df("mm_cdc_incremental", spark, sf_dir).collect()
    }
    docs = duck.execute(
        "SELECT doc_id, text FROM documents WHERE length(text) >= 1"
    ).fetchall()
    store = set()
    for doc_id, text in sorted(docs):
        if doc_id % 2 == 0:
            for _, _, content in _cdc_chunks(text):
                store.add(hashlib.md5(content.encode()).hexdigest())
    odd = sorted((d, t) for d, t in docs if d % 2 == 1)
    assert set(rows) == {d for d, _ in odd}
    for doc_id, text in odd:
        reused_c = reused_b = new_b = 0
        for _, _, content in _cdc_chunks(text):
            h = hashlib.md5(content.encode()).hexdigest()
            if h in store:
                reused_c += 1
                reused_b += len(content)
            else:
                new_b += len(content)
                store.add(h)  # the delta upload joins the store immediately
        r = rows[doc_id]
        assert (r["reused_chunks"], r["reused_bytes"], r["new_bytes"]) == (
            reused_c,
            reused_b,
            new_b,
        ), doc_id
        assert r["n_bytes"] == len(text), doc_id


# --- ts_motif_discovery: SNM-blocked matrix profile -------------------------


def test_motif_partner_is_valid_and_nontrivial(spark, sf_dir, duck):
    """Every reported motif partner must (1) exist as a real subsequence of
    the partner series, (2) respect the exclusion zone, and (3) have an SSD
    that matches recomputation from the raw daily series — the distance
    arithmetic and exclusion logic, independently replayed."""
    from rvi_big_data_api_spark.operators.telemetry import MP_M

    daily = {}
    for uid, day, cents in duck.execute("""
        SELECT user_id, date_trunc('day', ts) AS day,
               sum(floor(value * 100 + 0.5)::BIGINT)
        FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """).fetchall():
        daily.setdefault(uid, []).append(cents)
    rows = _df("ts_motif_discovery", spark, sf_dir).collect()
    assert rows
    for r in rows:
        s_a = daily[r["user_id"]]
        s_b = daily[r["partner_user"]]
        pa, pb = r["pos"], r["partner_pos"]
        assert 0 <= pa <= len(s_a) - MP_M, r
        assert 0 <= pb <= len(s_b) - MP_M, r
        if r["user_id"] == r["partner_user"]:
            assert abs(pa - pb) >= MP_M, r  # exclusion zone
        ssd = sum((s_a[pa + i] - s_b[pb + i]) ** 2 for i in range(MP_M))
        assert ssd == r["ssd_cents2"], r


def test_discord_and_motif_bracket_the_profile(spark, sf_dir):
    """Discord and motif come from the SAME per-position profile: per user,
    motif ssd <= discord ssd, with equality iff the user has one matched
    position class; both rows must reference real matched positions."""
    motif = {r["user_id"]: r for r in _df("ts_motif_discovery", spark, sf_dir).collect()}
    disc = {
        r["user_id"]: r
        for r in _df("anomaly_subsequence_discord", spark, sf_dir).collect()
    }
    assert set(motif) == set(disc)  # same matched-user universe
    for uid in motif:
        assert motif[uid]["ssd_cents2"] <= disc[uid]["ssd_cents2"], uid


def test_scrub_conserves_and_respects_ledger(spark, sf_dir):
    """corpus_substring_scrub vs the flagship's ledger: (1) removed-token
    counts equal the union of keep=false run coverages (recomputed in
    Python from the run table — overlap-aware); (2) docs with no removal
    runs pass through with n_removed = 0; (3) scrubbed token count + removed
    = original."""
    runs = _df("text_substring_dedup", spark, sf_dir).collect()
    removal: dict[int, set] = {}
    for r in runs:
        if not r["keep"]:
            removal.setdefault(r["doc_id"], set()).update(
                range(r["run_start"], r["run_start"] + r["span_tokens"])
            )
    out = {r["doc_id"]: r for r in _df("corpus_substring_scrub", spark, sf_dir).collect()}
    assert out
    for doc_id, r in out.items():
        expect = len(removal.get(doc_id, ()))
        assert r["n_removed"] == expect, (doc_id, r["n_removed"], expect)
        n_scrubbed = len(r["scrubbed_text"].split(" ")) if r["scrubbed_text"] else 0
        assert n_scrubbed + r["n_removed"] == r["n_tokens"], doc_id


def test_stream_cdc_reconciles_with_batch_incremental(spark, sf_dir):
    """stream_cdc_ingest (stateless: reuse = base membership only) vs
    mm_cdc_incremental (reuse = base OR earlier-delta): identical chunk
    geometry per doc (n_chunks, n_bytes equal), and the stateless form can
    only upload MORE — per doc, stream new_bytes >= batch new_bytes, with
    the difference exactly the intra-delta dup bytes."""
    batch = {r["doc_id"]: r for r in _df("mm_cdc_incremental", spark, sf_dir).collect()}
    stream = {r["doc_id"]: r for r in _df("stream_cdc_ingest", spark, sf_dir).collect()}
    assert set(batch) == set(stream)
    saw_gap = False
    for doc_id, b in batch.items():
        s = stream[doc_id]
        assert (s["n_chunks"], s["n_bytes"]) == (b["n_chunks"], b["n_bytes"]), doc_id
        assert s["new_bytes"] >= b["new_bytes"], doc_id
        saw_gap = saw_gap or s["new_bytes"] > b["new_bytes"]
    assert saw_gap, "fixture has no intra-delta dup chunks — reconciliation vacuous"


# --- win_regression_slope / eval_pinball_loss -------------------------------


def test_regression_slope_matches_numpy_on_sample(spark, sf_dir, duck):
    """Spot-verify the window OLS against numpy.polyfit on the trailing
    windows of a handful of users — the integer algebra (shift-invariant x,
    single ppm division) against an independent float implementation."""
    import numpy as np

    from rvi_big_data_api_spark.operators.windows import SLOPE_W

    rows = [
        r
        for r in _df("win_regression_slope", spark, sf_dir).collect()
        if r["user_id"] in (1, 2, 3)
    ]
    assert rows
    series: dict[int, list] = {}
    for uid, cents in duck.execute("""
        SELECT user_id, sum(floor(value * 100 + 0.5)::BIGINT)
        FROM events WHERE user_id IN (1, 2, 3)
        GROUP BY user_id, date_trunc('day', ts) ORDER BY 1, date_trunc('day', ts)
    """).fetchall():
        series.setdefault(uid, []).append(cents)
    by_uid_day: dict[int, int] = {}
    for r in sorted(rows, key=lambda r: (r["user_id"], r["day"])):
        uid = r["user_id"]
        i = by_uid_day.get(uid, 0)
        by_uid_day[uid] = i + 1
        ys = series[uid][max(0, i - SLOPE_W + 1) : i + 1]
        if len(ys) < 2:
            assert r["slope_ppm"] is None, r  # nullif(den, 0) single-row frame
            continue
        slope = np.polyfit(np.arange(len(ys)), np.array(ys, dtype=float), 1)[0]
        assert abs(r["slope_ppm"] / 1e6 - slope) < 1e-3 + abs(slope) * 1e-9, (r, slope)


def test_pinball_loss_table_shape_and_consistency(spark, sf_dir):
    """All four (model, quantile) rows exist; the centi-mean reconciles with
    the exact sum; and at q=0.5 the loss is symmetric (5x the absolute
    error), so models are comparable across quantiles."""
    rows = {(r["model"], r["q10"]): r for r in _df("eval_pinball_loss", spark, sf_dir).collect()}
    assert set(rows) == {
        ("naive_lag1", 5), ("naive_lag1", 9),
        ("trailing3_mean", 5), ("trailing3_mean", 9),
    }
    for key, r in rows.items():
        assert r["mean_loss_centi"] == r["loss_x10"] * 100 // r["n"], key
        assert r["n"] > 0 and r["loss_x10"] >= 0, key


def test_contamination_guard_reconciles_with_batch(spark, sf_dir):
    """stream_contamination_guard vs text_contamination: identical doc set
    and identical (n_grams, n_shared) per doc — the guard is the batch
    decontamination pass relocated to ingest, not a different metric."""
    batch = {r["doc_id"]: r for r in _df("text_contamination", spark, sf_dir).collect()}
    guard = {
        r["doc_id"]: r
        for r in _df("stream_contamination_guard", spark, sf_dir).collect()
    }
    assert set(batch) == set(guard)
    assert guard, "no contaminated docs in fixture — vacuous"
    for doc_id, g in guard.items():
        b = batch[doc_id]
        assert (g["n_grams"], g["n_shared"]) == (b["n_grams"], b["n_shared"]), doc_id
        assert g["verdict"] in ("quarantine", "review"), doc_id


def test_er_quality_gate_reconciles_with_pair_ledger(spark, sf_dir):
    """eval_er_quality vs a direct aggregate of er_record_linkage's output:
    the gate must be EXACTLY the ledger's summary (and the fixture's
    single-deletion universe should be fully recovered: recall = 1e6,
    precision < 1e6 iff deletion collisions exist)."""
    pairs = _df("er_record_linkage", spark, sf_dir).collect()
    (g,) = _df("eval_er_quality", spark, sf_dir).collect()
    n_true = sum(1 for p in pairs if p["true_match"])
    recovered = {p["id_b"] for p in pairs if p["true_match"]}
    assert g["n_pairs"] == len(pairs)
    assert g["n_true"] == n_true
    assert g["n_recovered"] == len(recovered)
    assert g["recall_ppm"] == len(recovered) * 1_000_000 // g["n_variants"]
    assert g["recall_ppm"] == 1_000_000, "single-deletion model must be fully recovered"
    assert 0 < g["precision_ppm"] <= 1_000_000


def test_generalize_repairs_the_audit(spark, sf_dir):
    """privacy_generalize vs privacy_k_anonymity: every record in a
    violating level-0 group must be assigned level >= 1; records in
    passing groups stay at level 0; shares partition the corpus."""
    audit = _df("privacy_k_anonymity", spark, sf_dir).collect()
    levels = {r["level"]: r for r in _df("privacy_generalize", spark, sf_dir).collect()}
    n_violating_docs = sum(r["group_size"] for r in audit if r["violates_k"])
    n_ok_docs = sum(r["group_size"] for r in audit if not r["violates_k"])
    assert levels[0]["n_docs"] == n_ok_docs
    assert sum(r["n_docs"] for r in levels.values()) == n_ok_docs + n_violating_docs
    assert sum(r["n_docs"] for r in levels.values() if r["level"] >= 1) == n_violating_docs
    assert abs(sum(r["share_ppm"] for r in levels.values()) - 1_000_000) < len(levels)


def test_snapshot_commit_isolation(spark, sf_dir):
    """sink_snapshot_commit: append grows rows (v2 > v1), delete shrinks
    only the rewritten file's contribution (v3 < v2 but v3 keeps every
    residue-1/2 row), and v1's audit equals scan_snapshot_manifest's v1 —
    committed versions are immutable across ops."""
    commits = {r["version"]: r for r in _df("sink_snapshot_commit", spark, sf_dir).collect()}
    assert set(commits) == {1, 2, 3}
    assert commits[2]["n_rows"] > commits[1]["n_rows"]
    assert commits[3]["n_rows"] < commits[2]["n_rows"]
    reads = {r["snapshot_id"]: r for r in _df("scan_snapshot_manifest", spark, sf_dir).collect()}
    assert commits[1]["n_rows"] == reads[1]["n_rows"]
    assert commits[1]["total_cents"] == reads[1]["total_cents"]


def test_cuped_reduces_variance_and_preserves_effect_direction(spark, sf_dir):
    """CUPED's contract: per arm, adjusted variance <= raw variance (theta
    is the pooled optimum, so it cannot increase X-explained variance on
    the pooled fit), and the adjustment is mean-preserving up to the
    covariate imbalance term (|mean_cuped - mean_post| bounded by
    |theta| * |mean_pre_arm - mean_pre_pooled|)."""
    rows = {r["arm"]: r for r in _df("eval_ab_cuped", spark, sf_dir).collect()}
    assert set(rows) == {"control", "treatment"}
    total_n = sum(r["n"] for r in rows.values())
    mx = sum(r["sum_pre_cents"] for r in rows.values()) / total_n
    for arm, r in rows.items():
        assert r["var_cuped"] <= r["var_post_milli"] / 1000 + 1e-6, arm
        drift = abs(r["sum_pre_cents"] / r["n"] - mx)
        assert abs(r["mean_cuped"] - r["mean_post_milli"] / 1000) <= drift + 1e-3, arm


def test_link_prediction_targets_are_nonadjacent_wedge_pairs(spark, sf_dir):
    """Every predicted pair must be NON-adjacent (no direct similarity
    edge), share >= cn common neighbors verifiable from the edge list, and
    never self-predict."""
    from rvi_big_data_api_spark.operators.llm_sim import sim_pair_edges

    edges = sim_pair_edges(spark, sf_dir).collect()
    adj: dict[int, set] = {}
    for e in edges:
        adj.setdefault(e["vec_a"], set()).add(e["vec_b"])
        adj.setdefault(e["vec_b"], set()).add(e["vec_a"])
    preds = _df("graph_link_prediction", spark, sf_dir).collect()
    assert preds
    for r in preds:
        a, b = r["node"], r["predicted"]
        assert a != b
        assert b not in adj.get(a, ()), (a, b)  # non-adjacent
        shared = adj.get(a, set()) & adj.get(b, set())
        assert len(shared) == r["cn"], (a, b, len(shared), r["cn"])


def test_reservoir_is_exact_bottom_k_and_mergeable(spark, sf_dir, duck):
    """The streamed reservoir equals the batch bottom-k recomputed in
    Python, and bottom-k is mergeable: bottomK(bottomK(A) ∪ bottomK(B)) ==
    bottomK(A ∪ B) over an arbitrary split — the property that makes it a
    legal streaming state."""
    from rvi_big_data_api_spark.streaming.streams import RESERVOIR_K

    ev = duck.execute("SELECT event_type, event_id FROM events").fetchall()
    pools: dict[str, list] = {}
    for et, eid in ev:
        pools.setdefault(et, []).append((hashlib.md5(str(eid).encode()).hexdigest(), eid))
    expect = {
        et: sorted(pool)[:RESERVOIR_K] for et, pool in pools.items()
    }
    got: dict[str, list] = {}
    for r in _df("stream_reservoir_sample", spark, sf_dir).collect():
        got.setdefault(r["event_type"], []).append(r["event_id"])
    assert set(got) == set(expect)
    for et in expect:
        assert sorted(got[et]) == sorted(i for _, i in expect[et]), et
        # mergeability on an arbitrary split
        a = [p for p in pools[et] if p[1] % 2 == 0]
        b = [p for p in pools[et] if p[1] % 2 == 1]
        merged = sorted(sorted(a)[:RESERVOIR_K] + sorted(b)[:RESERVOIR_K])[:RESERVOIR_K]
        assert merged == expect[et], et


# --- round-9 wave 3: streak / scenes / activity matrix / power ---------------


def test_longest_streak_matches_python_replica(spark, sf_dir, duck):
    """seq_longest_streak vs a direct Python islands replay over the
    distinct day sets — lengths, counts, and the earliest-start tiebreak."""
    rows = {r["user_id"]: r for r in _df("seq_longest_streak", spark, sf_dir).collect()}
    days: dict[int, set] = {}
    for uid, d in duck.execute(
        "SELECT DISTINCT user_id, epoch(date_trunc('day', ts))::BIGINT // 86400"
        " FROM events"
    ).fetchall():
        days.setdefault(uid, set()).add(d)
    assert set(rows) == set(days)
    for uid, ds in days.items():
        ordered = sorted(ds)
        streaks, start, prev = [], ordered[0], ordered[0]
        for d in ordered[1:]:
            if d == prev + 1:
                prev = d
                continue
            streaks.append((start, prev - start + 1))
            start = prev = d
        streaks.append((start, prev - start + 1))
        r = rows[uid]
        assert r["n_streaks"] == len(streaks), uid
        assert r["n_active_days"] == len(ds), uid
        best = max(l for _, l in streaks)
        assert r["longest_streak"] == best, uid
        assert r["longest_start_day"] == min(s for s, l in streaks if l == best), uid


def test_scene_cuts_partition_the_frames(spark, sf_dir):
    """mm_scene_cuts vs mm_audio_energy: scenes partition each doc's frames
    exactly (frame and byte conservation), scene ids start at 1 and are
    dense, and every scene's span is contiguous."""
    frames: dict[int, list] = {}
    for r in _df("mm_audio_energy", spark, sf_dir).collect():
        frames.setdefault(r["doc_id"], []).append(r)
    scenes: dict[int, list] = {}
    for r in _df("mm_scene_cuts", spark, sf_dir).collect():
        scenes.setdefault(r["doc_id"], []).append(r)
    assert set(frames) == set(scenes)
    for doc_id, sc in scenes.items():
        fr = frames[doc_id]
        assert sum(s["n_frames"] for s in sc) == len(fr), doc_id
        assert sum(s["scene_bytes"] for s in sc) == sum(f["frame_bytes"] for f in fr)
        ids = sorted(s["scene_id"] for s in sc)
        assert ids == list(range(1, len(ids) + 1)), doc_id
        spans = sorted((s["start_frame"], s["n_frames"]) for s in sc)
        nxt = 0
        for st, n in spans:
            assert st == nxt, (doc_id, st, nxt)
            nxt = st + n


def test_activity_matrix_partitions_traffic(spark, sf_dir, duck):
    """Cells partition each channel's events; exactly one peak per channel;
    shares sum to ~1e6 per channel (floor-division slack < n_cells)."""
    rows = _df("profile_activity_matrix", spark, sf_dir).collect()
    per_type: dict[str, list] = {}
    for r in rows:
        per_type.setdefault(r["event_type"], []).append(r)
    totals = dict(
        duck.execute("SELECT event_type, count(*) FROM events GROUP BY 1").fetchall()
    )
    assert set(per_type) == set(totals)
    for et, cells in per_type.items():
        assert sum(c["n"] for c in cells) == totals[et], et
        assert sum(1 for c in cells if c["is_peak"]) == 1, et
        slack = 1_000_000 - sum(c["share_ppm"] for c in cells)
        assert 0 <= slack < len(cells), et


def test_power_mde_matches_numpy(spark, sf_dir, duck):
    """eval_experiment_power vs numpy: MDE recomputed from raw per-user
    sums with population variance at the pinned z constants."""
    import math

    from rvi_big_data_api_spark.operators.analytics import (
        POWER_Z_ALPHA,
        POWER_Z_BETA,
    )

    (r,) = _df("eval_experiment_power", spark, sf_dir).collect()
    arms: dict[str, list] = {"control": [], "treatment": []}
    for uid, y in duck.execute("""
        SELECT user_id, sum(floor(value * 100 + 0.5)::BIGINT) FROM events GROUP BY 1
    """).fetchall():
        arm = "treatment" if hashlib.md5(str(uid).encode()).hexdigest()[0] >= "8" else "control"
        arms[arm].append(y)
    var = {
        a: (len(v) * sum(x * x for x in v) - sum(v) ** 2) / len(v) ** 2
        for a, v in arms.items()
    }
    mde = (POWER_Z_ALPHA + POWER_Z_BETA) * math.sqrt(
        var["control"] / len(arms["control"]) + var["treatment"] / len(arms["treatment"])
    )
    assert abs(r["mde_cents"] - mde) < 1e-4, (r["mde_cents"], mde)
    assert r["n_c"] == len(arms["control"]) and r["n_t"] == len(arms["treatment"])


def test_trimmed_mean_is_robust_and_ordered(spark, sf_dir, duck):
    """Trimmed/winsorized means vs a Python replica over raw per-user sums:
    boundary order lo <= hi, kept fraction ~= 1 - 2*TRIM_PCT%, and both
    robust means recomputed exactly."""
    from rvi_big_data_api_spark.operators.analytics import TRIM_PCT

    rows = {r["arm"]: r for r in _df("eval_trimmed_mean", spark, sf_dir).collect()}
    arms: dict[str, list] = {}
    for uid, y in duck.execute(
        "SELECT user_id, sum(floor(value * 100 + 0.5)::BIGINT) FROM events GROUP BY 1"
    ).fetchall():
        arm = "treatment" if hashlib.md5(str(uid).encode()).hexdigest()[0] >= "8" else "control"
        arms.setdefault(arm, []).append(y)
    for arm, ys in arms.items():
        ys.sort()
        n = len(ys)
        r = rows[arm]
        # exact order-statistic boundaries: smallest value with cum rank >= p%
        def bound(p):
            need = (n * p + 99) // 100  # ceil(n*p/100)
            return ys[need - 1]
        lo, hi = bound(TRIM_PCT), bound(100 - TRIM_PCT)
        assert (r["lo_cents"], r["hi_cents"]) == (lo, hi), arm
        kept = [y for y in ys if lo <= y <= hi]
        assert r["n_kept"] == len(kept), arm
        assert r["trimmed_mean_milli"] == sum(kept) * 1000 // len(kept), arm
        wins = [min(max(y, lo), hi) for y in ys]
        assert r["winsorized_mean_milli"] == sum(wins) * 1000 // n, arm


def test_dataset_diff_matches_card_halves(spark, sf_dir, duck):
    """corpus_dataset_diff vs direct recomputation of both halves' metrics;
    deltas must reconcile exactly."""
    rows = {r["metric"]: r for r in _df("corpus_dataset_diff", spark, sf_dir).collect()}
    assert set(rows) == {"n_docs", "n_tokens", "mean_tokens_ppm", "dup_ppm", "n_langs"}
    for s, col in ((0, "v_old"), (1, "v_new")):
        n_docs, n_tokens, n_uni, n_langs = duck.execute(f"""
            SELECT count(*), sum(len(string_split(text, ' '))),
                   count(DISTINCT md5(text)), count(DISTINCT lang)
            FROM documents WHERE doc_id % 2 = {s}
        """).fetchone()
        assert rows["n_docs"][col] == n_docs
        assert rows["n_tokens"][col] == n_tokens
        assert rows["mean_tokens_ppm"][col] == n_tokens * 1_000_000 // n_docs
        assert rows["dup_ppm"][col] == (n_docs - n_uni) * 1_000_000 // n_docs
        assert rows["n_langs"][col] == n_langs
    for m, r in rows.items():
        assert r["delta"] == r["v_new"] - r["v_old"], m


def test_seqlen_sweep_ceil_math_and_packing_dominance(spark, sf_dir, duck):
    """Packed sequences never exceed unpacked at any length; pad ledgers
    reconcile exactly against a Python ceil replay."""
    rows = {r["seq_len"]: r for r in _df("corpus_seqlen_sweep", spark, sf_dir).collect()}
    toks = [t for (t,) in duck.execute(
        "SELECT len(string_split(text, ' ')) FROM documents").fetchall()]
    for L, r in rows.items():
        unpacked = sum((t + L - 1) // L for t in toks)
        packed = (sum(toks) + L - 1) // L
        assert r["n_seqs_unpacked"] == unpacked, L
        assert r["n_seqs_packed"] == packed, L
        assert packed <= unpacked, L
        assert r["pad_tokens_unpacked"] == unpacked * L - sum(toks), L
        assert r["pad_tokens_packed"] == packed * L - sum(toks), L


def test_snapshot_gc_only_orphans_are_eligible(spark, sf_dir):
    """Exactly data_A (orphaned by the copy-on-write rewrite) is GC-eligible
    once v1/v2 expire; every live file is referenced by the live version."""
    rows = {r["file_name"]: r for r in _df("sink_snapshot_gc", spark, sf_dir).collect()}
    assert set(rows) == {"data_A", "data_B", "data_C", "data_A2"}
    assert rows["data_A"]["gc_eligible"] and rows["data_A"]["n_live_refs"] == 0
    for f in ("data_B", "data_C", "data_A2"):
        assert not rows[f]["gc_eligible"] and rows[f]["n_live_refs"] == 1, f
    # the rewrite dropped rows: A2 is a strict subset of A
    assert rows["data_A2"]["n_rows"] < rows["data_A"]["n_rows"]


def test_cdc_containment_pairs_verify_from_chunk_sets(spark, sf_dir, duck):
    """Every reported pair's shared-chunk count equals the true banded
    intersection of the two blobs' distinct chunk sets (Python replica),
    and containment_ppm uses the smaller set."""
    from rvi_big_data_api_spark.operators.multimodal import (
        CDC_CONT_MAX_REFS,
        CDC_CONT_MIN_PPM,
    )

    docs = duck.execute(
        "SELECT doc_id, text FROM documents WHERE length(text) >= 1"
    ).fetchall()
    sets = {
        d: {hashlib.md5(c.encode()).hexdigest() for _, _, c in _cdc_chunks(t)}
        for d, t in docs
    }
    refs: dict[str, int] = {}
    for s in sets.values():
        for h in s:
            refs[h] = refs.get(h, 0) + 1
    banded = {h for h, n in refs.items() if 2 <= n <= CDC_CONT_MAX_REFS}
    rows = _df("mm_cdc_containment", spark, sf_dir).collect()
    assert rows
    for r in rows:
        a, b = sets[r["doc_a"]], sets[r["doc_b"]]
        shared = len(a & b & banded)
        assert r["shared"] == shared, (r["doc_a"], r["doc_b"])
        assert r["min_chunks"] == min(len(a), len(b))
        assert r["containment_ppm"] == shared * 1_000_000 // min(len(a), len(b))
        assert r["containment_ppm"] >= CDC_CONT_MIN_PPM


def test_entropy_rate_information_inequalities(spark, sf_dir):
    """H(next|cur) <= H(cur,next) (chain rule: the difference is the
    context entropy H(cur) >= 0), both bounded by ln(n_distinct_bigrams),
    and both strictly positive on natural-ish text."""
    import math

    rows = _df("text_entropy_rate", spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r["entropy_rate_nats"] <= r["bigram_entropy_nats"], r
        assert r["bigram_entropy_nats"] <= math.log(r["n_distinct_bigrams"]) + 1e-9, r
