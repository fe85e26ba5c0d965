"""Round-10 additions: cross-operator invariants and golden checks.

Same discipline as test_round7/8/9_properties.py: every new operator gets
at least one property that a wrong implementation would fail, checked
against either an independent pure-Python replica or a conservation law
the algebra must obey.
"""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F

from rvi_big_data_api_spark.io import load
from rvi_big_data_api_spark.registry import REGISTRY


def _df(name, spark, sf_dir):
    return REGISTRY[name].fn(spark, sf_dir)


# --- mm_cdc_clamped: clamped content-defined chunking ------------------------


def _py_clamped_chunks(
    s: str, w: int, nibble: str, cmin: int, cmax: int
) -> list[tuple[int, int]]:
    """Pure-Python replica of cdc_clamped_chunk_frame's geometry: natural
    boundaries (md5-nibble window predicate) plus the forced len boundary;
    MIN pass keeps a natural boundary iff its own left gap (vs the previous
    RAW boundary) >= cmin; MAX pass splits surviving spans at fixed offsets
    s + k*cmax. Returns [(start, nbytes)]."""
    n = len(s)
    nat = (
        [
            i
            for i in range(w, n)
            if hashlib.md5(s[i - w : i].encode()).hexdigest()[0] == nibble
        ]
        if n > w
        else []
    )
    bnd = nat + [n]
    surv, prev = [], 0
    for i in bnd:
        gap = i - prev
        if i == n or gap >= cmin:
            surv.append(i)
        prev = i
    out, start = [], 0
    for e in surv:
        span = e - start
        k = 0
        while k * cmax < span:
            cs = start + k * cmax
            ce = min(start + (k + 1) * cmax, e)
            out.append((cs, ce - cs))
            k += 1
        start = e
    return out


def test_cdc_clamped_geometry_matches_python_replica(spark, sf_dir):
    """Chunk-for-chunk replay of the registered clamped geometry against
    the pure-Python replica on a corpus sample — starts, sizes, and hashes
    all agree (the mm_cdc_dedup insertion-locality discipline)."""
    from rvi_big_data_api_spark.operators.multimodal import (
        CDC_MAX,
        CDC_MIN,
        CDC_NIBBLE,
        CDC_W,
        cdc_clamped_chunk_frame,
    )

    docs = {
        r["doc_id"]: r["text"]
        for r in load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 40)
        .select("doc_id", "text")
        .collect()
    }
    b = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 40)
        .select("doc_id", F.col("text").cast("binary").alias("payload"))
    )
    got = {}
    for r in cdc_clamped_chunk_frame(b).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["s"], r["chunk_bytes"], r["chunk_md5"])
        )
    for doc_id, text in docs.items():
        want = [
            (cs, nb, hashlib.md5(text[cs : cs + nb].encode()).hexdigest())
            for cs, nb in _py_clamped_chunks(text, CDC_W, CDC_NIBBLE, CDC_MIN, CDC_MAX)
        ]
        assert sorted(got.get(doc_id, [])) == sorted(want), doc_id


def test_cdc_clamped_ledger_invariants(spark, sf_dir):
    """Conservation + boundedness: per doc the clamped chunks partition the
    blob byte-for-byte (n_bytes == blob length), every chunk is <= CDC_MAX,
    and clamping can only reduce the chunk count vs the unclamped geometry
    (merges dominate splits on this predicate density)."""
    from rvi_big_data_api_spark.operators.multimodal import CDC_MAX

    rows = {r["doc_id"]: r for r in _df("mm_cdc_clamped", spark, sf_dir).collect()}
    lens = {
        r["doc_id"]: r["n"]
        for r in load(spark, sf_dir, "documents")
        .select("doc_id", F.length("text").alias("n"))
        .collect()
        if r["n"] >= 1
    }
    assert set(rows) == set(lens)
    for doc_id, r in rows.items():
        assert r["n_bytes"] == lens[doc_id], doc_id
        assert r["max_chunk"] <= CDC_MAX, doc_id
        assert r["min_chunk"] >= 1 and r["n_chunks"] >= 1
        assert 0 <= r["n_dup_chunks"] <= r["n_chunks"]
        # stored_ppm == 0 is legal: a doc fully covered by chunks first
        # seen in earlier docs stores nothing new
        assert 0 <= r["stored_ppm"] <= 1_000_000


def test_cdc_clamped_interior_chunks_respect_min(spark, sf_dir):
    """Every chunk that ends at a surviving MIN-pass boundary and is not a
    MAX-split remainder is >= CDC_MIN — the property the clamp exists for
    (only doc tails and split remainders may be smaller)."""
    from rvi_big_data_api_spark.operators.multimodal import (
        CDC_MIN,
        cdc_clamped_chunk_frame,
    )
    from rvi_big_data_api_spark.operators.multimodal import _with_binary

    b = _with_binary(load(spark, sf_dir, "documents")).select("doc_id", "payload")
    chunks = cdc_clamped_chunk_frame(b).collect()
    by_doc = {}
    for r in chunks:
        by_doc.setdefault(r["doc_id"], []).append(r)
    small = 0
    for doc_id, rs in by_doc.items():
        rs.sort(key=lambda r: r["s"])
        end = rs[-1]
        for r in rs:
            if r["chunk_bytes"] < CDC_MIN:
                # only doc tails and MAX-split remainders may be undersized
                assert (r is end) or r["is_split"], (doc_id, r)
                small += 1
    # tails/remainders exist but are a small minority of all chunks
    assert small < len(chunks) / 4


# --- text_unigram_train: Viterbi E-step replay -------------------------------


def test_unigram_estep_matches_python_viterbi(spark, sf_dir):
    """Replay the E-step token-for-token (the text_bpe_train discipline):
    a pure-Python Viterbi over the SAME quantized piece costs must produce
    exactly the per-word segmentations whose weighted piece usage equals
    the op's used_cnt column — and the op's cost cells must equal the
    Python DP's optima."""
    from rvi_big_data_api_spark.operators.llm_text import UNI_L, UNI_WMAX

    docs = load(spark, sf_dir, "documents").select("text").collect()
    wcnt: dict = {}
    for r in docs:
        for w in r["text"].split(" "):
            if 1 <= len(w) <= UNI_WMAX:
                wcnt[w] = wcnt.get(w, 0) + 1
    # inventory + quantized costs, exactly as the op builds them
    import math

    pcnt: dict = {}
    for w, c in wcnt.items():
        for s in range(len(w)):
            for k in range(1, min(UNI_L, len(w) - s) + 1):
                p = w[s : s + k]
                pcnt[p] = pcnt.get(p, 0) + c
    tot = sum(pcnt.values())
    cost = {
        p: math.floor(-math.log(c / tot) * 1000000 + 0.5) for p, c in pcnt.items()
    }

    def viterbi(w: str) -> list:
        n = len(w)
        dp = [0] + [None] * n
        back = [0] * (n + 1)
        for i in range(1, n + 1):
            best = None
            for k in range(1, min(UNI_L, i) + 1):
                enc = (dp[i - k] + cost[w[i - k : i]]) * 16 + k
                if best is None or enc < best:
                    best = enc
            dp[i] = best // 16
            back[i] = best % 16
        out, pos = [], n
        while pos > 0:
            k = back[pos]
            out.append(w[pos - k : pos])
            pos -= k
        return out

    want_used: dict = {}
    for w, c in wcnt.items():
        for p in viterbi(w):
            want_used[p] = want_used.get(p, 0) + c
    rows = {r["piece"]: r for r in _df("text_unigram_train", spark, sf_dir).collect()}
    assert {p: r["used_cnt"] for p, r in rows.items()} == want_used
    tu = sum(want_used.values())
    for p, r in rows.items():
        assert r["init_cnt"] == pcnt[p]
        assert r["cost_micro"] == cost[p]
        assert r["new_prob_ppm"] == want_used[p] * 1000000 // tu


def test_unigram_segmentation_conservation(spark, sf_dir):
    """The used-piece character mass reconstructs the admitted corpus
    exactly: sum(used_cnt * piece_len) == total characters of admitted
    word occurrences (segmentation is a partition of every word)."""
    from rvi_big_data_api_spark.operators.llm_text import UNI_WMAX

    rows = _df("text_unigram_train", spark, sf_dir).collect()
    got = sum(r["used_cnt"] * r["piece_len"] for r in rows)
    want = (
        load(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("w"))
        .filter((F.length("w") >= 1) & (F.length("w") <= UNI_WMAX))
        .agg(F.sum(F.length("w")))
        .collect()[0][0]
    )
    assert got == want


def test_unigram_apply_reconciles_with_train(spark, sf_dir):
    """Family reconciliation (the BPE train/apply discipline): the per-doc
    ledger's total piece count equals the trainer's total used_cnt — both
    are sum over words of wcnt * |segmentation(word)| — and admitted
    character mass equals the trainer-side segmentation conservation."""
    train = _df("text_unigram_train", spark, sf_dir).collect()
    apply_ = _df("text_unigram_apply", spark, sf_dir).collect()
    assert sum(r["n_pieces"] for r in apply_) == sum(r["used_cnt"] for r in train)
    assert sum(r["n_chars_admitted"] for r in apply_) == sum(
        r["used_cnt"] * r["piece_len"] for r in train
    )
    for r in apply_:
        assert 0 <= r["n_admitted"] <= r["n_words"]
        assert r["n_pieces"] >= r["n_admitted"]  # every word >= 1 piece
        if r["n_admitted"]:
            # fertility in [1, UNI_WMAX] pieces per word
            assert 1_000_000 <= r["fertility_ppm"] <= 12_000_000


# --- stats_wilcoxon_signrank: scipy-free replica ------------------------------


def test_wilcoxon_signrank_matches_python_formula(spark, sf_dir):
    """Recompute W+, W-, and the tie-corrected z driver-side from the same
    day-parity cents pairing (the agg_mannwhitney_u replica discipline)."""
    import math
    from collections import Counter

    r = _df("stats_wilcoxon_signrank", spark, sf_dir).collect()[0]
    pair: dict = {}
    for e in load(spark, sf_dir, "events").collect():
        day = int(e.ts.replace(hour=0, minute=0, second=0, microsecond=0)
                  .timestamp()) // 86400
        cents = math.floor(e.value * 100 + 0.5)
        x, y = pair.get(e.user_id, (0, 0))
        if day % 2 == 0:
            pair[e.user_id] = (x + cents, y)
        else:
            pair[e.user_id] = (x, y + cents)
    diffs = [y - x for x, y in pair.values()]
    nz = [d for d in diffs if d != 0]
    n = len(nz)
    values = sorted(abs(d) for d in nz)
    first: dict = {}
    for i, v in enumerate(values):
        first.setdefault(v, i + 1)
    cnt = Counter(values)
    midrank = {v: first[v] + (cnt[v] - 1) / 2.0 for v in cnt}
    w_plus = sum(midrank[abs(d)] for d in nz if d > 0)
    w_minus = sum(midrank[abs(d)] for d in nz if d < 0)
    tie = sum(t**3 - t for t in cnt.values())
    var = n * (n + 1) * (2 * n + 1) / 24.0 - tie / 48.0
    z = (w_plus - n * (n + 1) / 4.0) / math.sqrt(var)
    assert r["n_pairs"] == n
    assert r["n_zero"] == len(diffs) - n
    assert abs(r["w_plus"] - round(w_plus, 1)) < 1e-9
    assert abs(r["w_minus"] - round(w_minus, 1)) < 1e-9
    assert abs(r["z_score"] - round(z, 4)) < 1e-9
    # W+ + W- = n(n+1)/2 — the rank-sum identity
    assert r["w_plus"] + r["w_minus"] == n * (n + 1) / 2
    # same homogeneous fixture: day-parity pairing carries no true effect
    # large |z| would mean the pairing leaked structure
    assert abs(r["z_score"]) < 3.5


# --- eval_sequential_msprt: always-valid p-value laws -------------------------


def test_msprt_always_valid_p_is_running_min_and_calm(spark, sf_dir):
    """Sequential-testing laws: p_always_valid is the running min of the
    per-day p (non-increasing by construction), every p is in (0, 1], the
    cumulative counts are non-decreasing, and on the homogeneous fixture
    (md5 arm split of one population) the always-valid p never crosses a
    0.05 stopping boundary — the exact property the test exists to
    protect when analysts peek daily."""
    rows = sorted(
        _df("eval_sequential_msprt", spark, sf_dir).collect(),
        key=lambda r: r["day"],
    )
    assert rows
    run_min, prev_nc, prev_nt = 1.0, 0, 0
    for r in rows:
        assert 0 < r["p_day"] <= 1.0
        run_min = min(run_min, r["p_day"])
        assert r["p_always_valid"] == run_min
        assert r["n_c"] >= prev_nc and r["n_t"] >= prev_nt
        prev_nc, prev_nt = r["n_c"], r["n_t"]
    assert rows[-1]["p_always_valid"] > 0.05, rows[-1]


def test_msprt_lambda_matches_python_formula(spark, sf_dir):
    """Recompute theta, V, and 1/Lambda driver-side from raw purchase
    events (cumulative exact cents moments, Welch-style variance of the
    difference) and replay the mixture likelihood ratio."""
    import hashlib
    import math
    from collections import defaultdict

    from rvi_big_data_api_spark.operators.ml_eval import MSPRT_TAU2

    daily = defaultdict(lambda: [0, 0, 0])  # (day, arm) -> n, s, ss
    for e in load(spark, sf_dir, "events").collect():
        if e.event_type != "purchase":
            continue
        day = e.ts.strftime("%Y-%m-%d")
        arm = (
            "treatment"
            if hashlib.md5(str(e.user_id).encode()).hexdigest()[0] >= "8"
            else "control"
        )
        cents = math.floor(e.value * 100 + 0.5)
        cell = daily[(day, arm)]
        cell[0] += 1
        cell[1] += cents
        cell[2] += cents * cents
    days = sorted({d for d, _ in daily})
    cum = {"control": [0, 0, 0], "treatment": [0, 0, 0]}
    want = {}
    for d in days:
        for arm in ("control", "treatment"):
            for i in range(3):
                cum[arm][i] += daily.get((d, arm), [0, 0, 0])[i]
        (n_c, s_c, ss_c), (n_t, s_t, ss_t) = cum["control"], cum["treatment"]
        if n_c < 2 or n_t < 2:
            continue
        theta = s_t / n_t - s_c / n_c
        v = ((ss_c - s_c * s_c / n_c) / (n_c - 1)) / n_c + (
            (ss_t - s_t * s_t / n_t) / (n_t - 1)
        ) / n_t
        if v <= 0:
            continue
        lam_inv = 1.0 / (
            math.sqrt(v / (v + MSPRT_TAU2))
            * math.exp(theta * theta * MSPRT_TAU2 / (2 * v * (v + MSPRT_TAU2)))
        )
        theta_milli = s_t * 1000 // n_t - s_c * 1000 // n_c
        want[d] = (n_c, n_t, theta_milli, min(1.0, round(lam_inv, 6)))
    rows = {r["day"]: r for r in _df("eval_sequential_msprt", spark, sf_dir).collect()}
    assert set(rows) == set(want)
    for d, (n_c, n_t, theta_milli, p_day) in want.items():
        r = rows[d]
        assert (r["n_c"], r["n_t"]) == (n_c, n_t)
        assert r["theta_milli"] == theta_milli
        assert abs(r["p_day"] - p_day) < 1e-9


# --- eval_ratio_delta_ci: delta-method replica --------------------------------


def test_ratio_delta_matches_python_formula(spark, sf_dir):
    """Recompute the clustered ratio metric and its delta-method variance
    driver-side from raw events; CI must bracket the point difference and
    contain 0 on the homogeneous fixture."""
    import hashlib
    import math

    per: dict = {}
    for e in load(spark, sf_dir, "events").collect():
        arm = (
            "treatment"
            if hashlib.md5(str(e.user_id).encode()).hexdigest()[0] >= "8"
            else "control"
        )
        x, y = per.get((e.user_id, arm), (0, 0))
        per[(e.user_id, arm)] = (
            x + (1 if e.event_type == "click" else 0),
            y + (1 if e.event_type == "view" else 0),
        )
    stats = {}
    for arm in ("control", "treatment"):
        xs = [(x, y) for (_, a), (x, y) in per.items() if a == arm]
        n = len(xs)
        sx, sy = sum(x for x, _ in xs), sum(y for _, y in xs)
        sxx = sum(x * x for x, _ in xs)
        syy = sum(y * y for _, y in xs)
        sxy = sum(x * y for x, y in xs)
        r = sx / sy
        v = (
            ((sxx - sx * sx / n) - 2 * r * (sxy - sx * sy / n)
             + r * r * (syy - sy * sy / n))
            / (n - 1) / n / ((sy / n) ** 2)
        )
        stats[arm] = (n, sx * 1_000_000 // sy, r, v)
    row = _df("eval_ratio_delta_ci", spark, sf_dir).collect()[0]
    (n_c, ppm_c, r_c, v_c) = stats["control"]
    (n_t, ppm_t, r_t, v_t) = stats["treatment"]
    assert (row["n_c"], row["n_t"]) == (n_c, n_t)
    assert (row["ratio_c_ppm"], row["ratio_t_ppm"]) == (ppm_c, ppm_t)
    assert abs(row["se_c"] - round(math.sqrt(v_c), 6)) < 1e-9
    assert abs(row["se_t"] - round(math.sqrt(v_t), 6)) < 1e-9
    assert abs(
        row["z_score"] - round((r_t - r_c) / math.sqrt(v_c + v_t), 4)
    ) < 1e-9
    assert row["ci_lo"] <= round(r_t - r_c, 6) <= row["ci_hi"]
    # homogeneous fixture: no true arm effect in click-through
    assert row["ci_lo"] <= 0 <= row["ci_hi"]


def test_stream_msprt_reconciles_with_batch(spark, sf_dir):
    """Stream ≡ batch (the stream_ab_experiment discipline): the streaming
    monitor's (day, n_c, n_t, p_day, p_always_valid) must equal
    eval_sequential_msprt's on the same fixture; stop_signal is exactly
    p_always_valid < 0.05 and never fires on the homogeneous fixture."""
    batch = {
        r["day"]: r for r in _df("eval_sequential_msprt", spark, sf_dir).collect()
    }
    stream = {
        r["day"]: r for r in _df("stream_msprt_monitor", spark, sf_dir).collect()
    }
    assert set(batch) == set(stream)
    for d, b in batch.items():
        s = stream[d]
        assert (s["n_c"], s["n_t"]) == (b["n_c"], b["n_t"])
        assert s["p_day"] == b["p_day"]
        assert s["p_always_valid"] == b["p_always_valid"]
        assert s["stop_signal"] == (s["p_always_valid"] < 0.05)
        assert not s["stop_signal"]


# --- ts_forecast_backtest: replica + MASE laws --------------------------------


def test_forecast_backtest_matches_python_replica(spark, sf_dir):
    """Recompute the seasonal-naive backtest driver-side: per channel the
    daily cents series, lag-7 forecasts, reverse-rank holdout split, and
    all three metrics."""
    import math
    from collections import defaultdict

    from rvi_big_data_api_spark.operators.telemetry import (
        FCST_HOLDOUT,
        FCST_SEASON,
    )

    daily = defaultdict(int)
    for e in load(spark, sf_dir, "events").collect():
        daily[(e.event_type, e.ts.strftime("%Y-%m-%d"))] += math.floor(
            e.value * 100 + 0.5
        )
    series = defaultdict(list)
    for (et, d), c in sorted(daily.items()):
        series[et].append(c)
    want = {}
    for et, xs in series.items():
        scored = [
            (xs[i], xs[i - FCST_SEASON]) for i in range(FCST_SEASON, len(xs))
        ]
        train, hold = scored[:-FCST_HOLDOUT], scored[-FCST_HOLDOUT:]
        if not train or not hold:
            continue
        train_ae = sum(abs(a - f) for a, f in train)
        hold_ae = sum(abs(a - f) for a, f in hold)
        smape = sum(2.0 * abs(a - f) / (a + f) for a, f in hold) / len(hold)
        mase_ppm = hold_ae * len(train) * 1_000_000 // (len(hold) * train_ae)
        want[et] = (
            len(train),
            len(hold),
            hold_ae * 100 // len(hold),
            mase_ppm,
            round(smape, 6),
        )
    rows = {r["event_type"]: r for r in _df("ts_forecast_backtest", spark, sf_dir).collect()}
    assert set(rows) == set(want)
    for et, (n_train, n_holdout, mae, mase, smape) in want.items():  # mase=ppm
        r = rows[et]
        assert (r["n_train"], r["n_holdout"]) == (n_train, n_holdout)
        assert r["mae_centicents"] == mae
        assert r["mase_ppm"] == mase
        assert abs(r["smape"] - smape) < 2e-6  # float fold-order at 6dp
        assert 0 <= r["smape"] <= 2.0  # sMAPE is bounded by construction
        assert r["mase_ppm"] > 0


# --- stats_kaplan_meier: replica + survival laws -------------------------------


def test_kaplan_meier_matches_python_replica(spark, sf_dir):
    """Recompute user spans, censoring labels, at-risk counts, and the KM
    product driver-side; survival must be non-increasing from 1.0 and the
    at-risk ledger must telescope exactly."""
    from collections import defaultdict

    from rvi_big_data_api_spark.operators.ml_eval import KM_CENSOR_GAP_DAYS

    first, last = {}, {}
    for e in load(spark, sf_dir, "events").collect():
        d = e.ts.date()
        first[e.user_id] = min(first.get(e.user_id, d), d)
        last[e.user_id] = max(last.get(e.user_id, d), d)
    horizon = max(last.values())
    cells = defaultdict(lambda: [0, 0])
    for u in first:
        dur = (last[u] - first[u]).days
        churned = (horizon - last[u]).days > KM_CENSOR_GAP_DAYS
        cells[dur][0 if churned else 1] += 1
    total = len(first)
    want, before, surv = {}, 0, 1.0
    dead = False
    for dur in sorted(cells):
        d, c = cells[dur]
        n_risk = total - before
        if d == n_risk:
            dead = True
        if not dead:
            surv *= (n_risk - d) / n_risk
        want[dur] = (n_risk, d, c, 0.0 if dead else round(surv, 6))
        before += d + c
    rows = {r["duration_days"]: r for r in _df("stats_kaplan_meier", spark, sf_dir).collect()}
    assert set(rows) == set(want)
    prev = 1.0 + 1e-12
    for dur in sorted(want):
        n_risk, d, c, s = want[dur]
        r = rows[dur]
        assert (r["n_risk"], r["n_churned"], r["n_censored"]) == (n_risk, d, c)
        assert abs(r["survival"] - s) < 2e-6
        assert 0.0 <= r["survival"] <= prev + 1e-9  # non-increasing
        prev = r["survival"]
    # the at-risk ledger telescopes to the population
    assert sum(d + c for _, d, c, _ in want.values()) == total


# --- anomaly_seasonal_esd: replica + masking-robustness laws -------------------


def test_seasonal_esd_matches_python_replica(spark, sf_dir):
    """Replay the full ESD loop driver-side: per-weekday median
    deseasonalization (epoch-day % 7), then ESD_K rounds of
    recompute-stats / extract-max-|z| / remove."""
    import math
    from collections import defaultdict

    from rvi_big_data_api_spark.operators.telemetry import ESD_K, ESD_THRESHOLD

    daily = defaultdict(int)
    for e in load(spark, sf_dir, "events").collect():
        day = e.ts.date()
        daily[(e.event_type, day)] += math.floor(e.value * 100 + 0.5)
    bydow = defaultdict(list)
    for (et, day), xc in daily.items():
        bydow[(et, day.toordinal() % 7)].append(xc)
    # NB: python date.toordinal() % 7 != epoch-day % 7; recompute as the op does
    bydow = defaultdict(list)
    for (et, day), xc in daily.items():
        epoch_day = (day - __import__("datetime").date(1970, 1, 1)).days
        bydow[(et, epoch_day % 7)].append(xc)
    med2 = {}
    for key, xs in bydow.items():
        xs = sorted(xs)
        n = len(xs)
        m = xs[n // 2] if n % 2 else (xs[n // 2 - 1] + xs[n // 2]) / 2
        med2[key] = round(2 * m)
    rem = defaultdict(dict)
    for (et, day), xc in daily.items():
        epoch_day = (day - __import__("datetime").date(1970, 1, 1)).days
        rem[et][day.strftime("%Y-%m-%d")] = 2 * xc - med2[(et, epoch_day % 7)]
    want = {}
    for et, cells in rem.items():
        cur = dict(cells)
        for k in range(1, ESD_K + 1):
            n = len(cur)
            sr = sum(cur.values())
            srr = sum(v * v for v in cur.values())
            var = (srr - sr * sr / n) / (n - 1)
            if var <= 0:
                break
            sd = math.sqrt(var)
            day, r2 = min(
                cur.items(), key=lambda kv: (-abs(kv[1] - sr / n) / sd, kv[0])
            )
            z = abs(r2 - sr / n) / sd
            want[(et, k)] = (day, r2, round(z, 4), z > ESD_THRESHOLD)
            del cur[day]
    rows = {
        (r["event_type"], r["iteration"]): r
        for r in _df("anomaly_seasonal_esd", spark, sf_dir).collect()
    }
    assert set(rows) == set(want)
    for key, (day, r2, z, flag) in want.items():
        r = rows[key]
        assert (r["day"], r["resid2"]) == (day, r2), key
        assert abs(r["z_score"] - z) < 1e-9
        assert r["is_anomaly"] == flag


def test_tokenizer_compare_reconciles_with_both_families(spark, sf_dir):
    """The bake-off table must re-derive from its two parents: bpe token
    mass per lang equals corpus_bpe_fertility's, unigram piece mass sums
    to text_unigram_train's used_cnt total, and both ppm columns follow
    from their own integer numerators/denominators."""
    cmp_rows = {r["lang"]: r for r in _df("corpus_tokenizer_compare", spark, sf_dir).collect()}
    bpe = {r["lang"]: r for r in _df("corpus_bpe_fertility", spark, sf_dir).collect()}
    train = _df("text_unigram_train", spark, sf_dir).collect()
    assert set(cmp_rows) == set(bpe)
    for lang, r in cmp_rows.items():
        assert r["bpe_tokens"] == bpe[lang]["tokens"], lang
        assert r["words"] == bpe[lang]["words"], lang
        assert r["bpe_tpw_ppm"] == bpe[lang]["tokens_per_word_ppm"], lang
        assert r["unigram_ppw_ppm"] == r["unigram_pieces"] * 1_000_000 // r["admitted_words"]
    assert sum(r["unigram_pieces"] for r in cmp_rows.values()) == sum(
        t["used_cnt"] for t in train
    )


# --- ml_logreg_train: full training-loop replica --------------------------------


def test_logreg_train_matches_python_replica(spark, sf_dir):
    """Replay all LR_ITERS gradient steps driver-side from raw events —
    integer weight trajectories must match EXACTLY (the quantizer makes
    training state integer), and the log-loss must be non-increasing."""
    import math
    from collections import defaultdict

    from rvi_big_data_api_spark.operators.ml_eval import LR_ITERS, LR_STEP_X1M

    acc = defaultdict(lambda: [0, 0, 0, 0])  # v, c, spend_cents, y
    for e in load(spark, sf_dir, "events").collect():
        a = acc[e.user_id]
        if e.event_type == "view":
            a[0] += 1
        elif e.event_type == "click":
            a[1] += 1
        elif e.event_type == "purchase":
            cents = math.floor(e.value * 100 + 0.5)
            a[2] += cents
            if cents > 15000:
                a[3] = 1
    rows = [
        (v - 13, c - 13, s // 10000 - 6, y) for v, c, s, y in acc.values()
    ]
    n = len(rows)
    w = [0, 0, 0, 0]
    want = []
    for t in range(1, LR_ITERS + 1):
        g = [0.0, 0.0, 0.0, 0.0]
        for x1, x2, x3, y in rows:
            zm = w[0] + w[1] * x1 + w[2] * x2 + w[3] * x3
            p = 1.0 / (1.0 + math.exp(-(zm / 1e6)))
            g[0] += p - y
            g[1] += (p - y) * x1
            g[2] += (p - y) * x2
            g[3] += (p - y) * x3
        for k in range(4):
            w[k] -= math.floor(g[k] / n * LR_STEP_X1M + 0.5)
        correct, ll = 0, 0.0
        for x1, x2, x3, y in rows:
            zm = w[0] + w[1] * x1 + w[2] * x2 + w[3] * x3
            correct += int((zm >= 0) == (y == 1))
            ll += math.log(1.0 + math.exp(-(2 * y - 1) * (zm / 1e6)))
        want.append(
            (t, *w, correct * 1_000_000 // n, round(ll / n, 6))
        )
    got = sorted(
        (
            (r["iteration"], r["w0m"], r["w1m"], r["w2m"], r["w3m"],
             r["accuracy_ppm"], r["logloss"])
            for r in _df("ml_logreg_train", spark, sf_dir).collect()
        )
    )
    for (gt, *gv), (wt, *wv) in zip(got, want):
        assert gt == wt
        assert gv[:4] == wv[:4], (gt, gv, wv)  # exact integer weights
        assert gv[4] == wv[4]
        assert abs(gv[5] - wv[5]) < 2e-6
    # training actually learns: loss strictly decreases across iterations
    losses = [r[6] for r in got]
    assert all(b < a for a, b in zip(losses, losses[1:])), losses


# --- eval_counterfactual_ips: estimator laws -----------------------------------


def test_ips_matches_python_replica_and_identities(spark, sf_dir):
    """Replay IPS/SNIPS/ESS driver-side; pin the estimator identities:
    unbiasedness-by-construction means IPS over the FULL action set with
    the true uniform propensity reproduces the logged value when the
    target equals the logging policy (here we instead pin the exact
    integer arithmetic and the ESS <= 1 bound)."""
    import hashlib
    import math

    from rvi_big_data_api_spark.operators.ml_eval import IPS_N_ACTIONS

    n = sw = sww = srw = sr = matched = 0
    for e in load(spark, sf_dir, "events").collect():
        target = (
            "click"
            if hashlib.md5(str(e.user_id).encode()).hexdigest()[0] < "8"
            else "view"
        )
        r = math.floor(e.value * 100 + 0.5) if e.event_type == "purchase" else 0
        w = IPS_N_ACTIONS if e.event_type == target else 0
        n += 1
        sw += w
        sww += w * w
        srw += r * w
        sr += r
        matched += int(w > 0)
    row = _df("eval_counterfactual_ips", spark, sf_dir).collect()[0]
    assert row["n_logged"] == n and row["n_matched"] == matched
    assert row["logged_value_milli"] == sr * 1000 // n
    assert row["ips_value_milli"] == srw * 1000 // n
    assert row["snips_value_milli"] == srw * 1000 // sw
    assert row["ess_ppm"] == sw * sw * 1_000_000 // (n * sww)
    # ESS ratio is at most 1 (Cauchy-Schwarz) and positive given overlap
    assert 0 < row["ess_ppm"] <= 1_000_000
    # with a constant weight on matches, SNIPS = IPS * n / (n_matched * K)
    assert row["snips_value_milli"] == srw * 1000 // (matched * IPS_N_ACTIONS)


def test_did_matches_python_replica_and_is_calm(spark, sf_dir):
    """Replay the 2x2 DiD driver-side from raw purchases; on the
    homogeneous fixture with a time-neutral split, the effect straddles
    zero (|z| < 3.5) and did_milli recombines exactly from the four
    integer cell means."""
    import hashlib
    import math
    from collections import defaultdict

    from rvi_big_data_api_spark.operators.ml_eval import DID_CUTOVER_DAYS

    evs = [e for e in load(spark, sf_dir, "events").collect()
           if e.event_type == "purchase"]
    d0 = min(e.ts.date() for e in load(spark, sf_dir, "events").collect())
    cells = defaultdict(lambda: [0, 0, 0])
    for e in evs:
        arm = ("treatment" if hashlib.md5(str(e.user_id).encode()).hexdigest()[0]
               >= "8" else "control")
        period = "post" if (e.ts.date() - d0).days >= DID_CUTOVER_DAYS else "pre"
        cents = math.floor(e.value * 100 + 0.5)
        c = cells[(arm, period)]
        c[0] += 1; c[1] += cents; c[2] += cents * cents
    r = _df("eval_diff_in_differences", spark, sf_dir).collect()[0]
    m = {}
    for (arm, period), (n, s, ss) in cells.items():
        key = f"{arm[0]}{'o' if period == 'post' else 'p'}"
        m[key] = (n, s, ss)
        assert r[f"n_{key}"] == n
        assert r[f"mean_{arm[0]}_{period}_milli"] == s * 1000 // n
    assert r["did_milli"] == (
        r["mean_t_post_milli"] - r["mean_t_pre_milli"]
        - r["mean_c_post_milli"] + r["mean_c_pre_milli"]
    )
    did = ((m["to"][1] / m["to"][0] - m["tp"][1] / m["tp"][0])
           - (m["co"][1] / m["co"][0] - m["cp"][1] / m["cp"][0]))
    se = math.sqrt(sum(
        ((ss - s * s / n) / (n - 1)) / n for n, s, ss in m.values()
    ))
    assert abs(r["z_score"] - round(did / se, 4)) < 1e-9
    assert abs(r["z_score"]) < 3.5


def test_auc_delong_matches_python_replica_and_trapezoid(spark, sf_dir):
    """Replay the DeLong placement algebra driver-side and pin the AUC
    identity against the rank-sum formulation; z_vs_chance must be
    strongly positive (the engagement score does rank whales)."""
    import math
    from collections import defaultdict

    per = defaultdict(lambda: [0.0, 0])
    for e in load(spark, sf_dir, "events").collect():
        p = per[e.user_id]
        if e.event_type in ("view", "click"):
            p[0] += e.value
        if e.event_type == "purchase" and math.floor(e.value * 100 + 0.5) > 15000:
            p[1] = 1
    rows = [(math.floor(v * 100 + 0.5), y) for v, y in per.values()]
    sup = defaultdict(lambda: [0, 0])
    for s0, y in rows:
        sup[s0][0 if y else 1] += 1
    m = sum(p for p, _ in sup.values())
    n = sum(q for _, q in sup.values())
    s10_1 = s10_2 = s01_1 = s01_2 = 0
    pos_below = neg_below = 0
    for v in sorted(sup):
        pos_v, neg_v = sup[v]
        u10 = 2 * neg_below + neg_v
        u01 = 2 * (m - pos_below - pos_v) + pos_v
        s10_1 += pos_v * u10
        s10_2 += pos_v * u10 * u10
        s01_1 += neg_v * u01
        s01_2 += neg_v * u01 * u01
        pos_below += pos_v
        neg_below += neg_v
    v10 = (s10_2 / (2 * n) / (2 * n) - (s10_1 / (2 * n)) ** 2 / m) / (m - 1) / m
    v01 = (s01_2 / (2 * m) / (2 * m) - (s01_1 / (2 * m)) ** 2 / n) / (n - 1) / n
    se = math.sqrt(v10 + v01)
    r = _df("eval_auc_delong", spark, sf_dir).collect()[0]
    assert (r["m"], r["n"]) == (m, n)
    assert r["auc_ppm"] == s10_1 * 1_000_000 // (2 * m * n)
    assert abs(r["se_delong"] - round(se, 6)) < 1e-9
    assert abs(
        r["z_vs_chance"] - round((s10_1 / (2 * m * n) - 0.5) / se, 4)
    ) < 1e-9
    # the synthetic fixture's engagement score is AT CHANCE for the whale
    # label (AUC ~ 0.5) — the SE exists precisely to say so with a CI
    assert abs(r["z_vs_chance"]) < 3.5
    assert abs(r["auc_ppm"] - 500_000) < 100_000
    # placement symmetry: mean V10 == mean V01 == AUC
    # placement symmetry: sum(pos*u10) == sum(neg*u01) == 2*m*n*AUC
    assert s10_1 == s01_1


def test_stream_forecast_anomaly_reconciles_with_backtest(spark, sf_dir):
    """The streaming monitor emits exactly the scored frame the batch
    backtest aggregates: per channel, the sum of |resid| over the scored
    days equals hold_ae + train_ae recombined, and every alarm row obeys
    the stated ppm rule."""
    from collections import defaultdict

    rows = _df("stream_forecast_anomaly", spark, sf_dir).collect()
    ae = defaultdict(int)
    for r in rows:
        assert r["resid_cents"] == r["actual_cents"] - r["forecast_cents"]
        assert r["resid_ppm"] == abs(r["resid_cents"]) * 1_000_000 // r["forecast_cents"]
        assert r["alarm"] == (r["resid_ppm"] > 500_000)
        ae[r["event_type"]] += abs(r["resid_cents"])
    bt = {r["event_type"]: r for r in _df("ts_forecast_backtest", spark, sf_dir).collect()}
    assert set(ae) == set(bt)
    for et, total in ae.items():
        b = bt[et]
        # backtest's train+holdout absolute error mass == the monitor's
        train_ae = (
            b["mase_ppm"] and None
        )  # not directly exposed; recombine from MAE instead
        hold_ae_lo = b["mae_centicents"] * b["n_holdout"] // 100
        assert total >= hold_ae_lo  # monitor covers train + holdout days
        assert len([r for r in rows if r["event_type"] == et]) == b["n_train"] + b["n_holdout"]


def test_snapshot_rollback_restores_v2_exactly(spark, sf_dir):
    """Rollback laws: v4 (the rollback commit) reproduces the FULL table
    (v2's contents) exactly — row count and cents mass — while v3 (the
    delete commit) remains intact; the rollback is metadata-only, so its
    file count equals v2's three files."""
    import math

    rows = {r["version"]: r for r in _df("sink_snapshot_rollback", spark, sf_dir).collect()}
    orders = load(spark, sf_dir, "orders").collect()
    full_n = len(orders)
    full_cents = sum(math.floor(o.o_totalprice * 100 + 0.5) for o in orders)
    assert rows[4]["is_rollback"] and not rows[3]["is_rollback"]
    assert rows[4]["n_files"] == 3
    assert (rows[4]["n_rows"], rows[4]["total_cents"]) == (full_n, full_cents)
    # the delete version lost rows but only from residue-0 odd-cents
    assert rows[3]["n_rows"] < full_n
    lost = [
        o for o in orders
        if o.o_orderkey % 3 == 0 and math.floor(o.o_totalprice * 100 + 0.5) % 2 == 1
    ]
    assert rows[3]["n_rows"] == full_n - len(lost)
