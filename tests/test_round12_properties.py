"""Round-12 additions: cross-operator invariants and golden checks.

Same discipline as test_round7..11_properties.py: every new operator (and
every ADVICE fix) gets at least one property that a wrong implementation
would fail, checked against an independent pure-Python replica or a
conservation law the algebra must obey.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from rvi_big_data_api_spark.io import load
from rvi_big_data_api_spark.registry import REGISTRY


def _df(name, spark, sf_dir):
    return REGISTRY[name].fn(spark, sf_dir)


# --- ADVICE r11 item 1: degenerate-corpus guard in _bt_strengths --------------


def test_bt_strengths_empty_edges_guard(spark, tmp_path):
    """A one-source corpus produces NO cross-source preference edges; the
    trained artifact must be empty (edges, [], {}, 0) and both consumers
    must emit empty frames instead of crashing on items[0] / dividing by
    a None pair count (ADVICE r11 item 1)."""
    rows = [(i, "alpha beta gamma delta", "en", "web", 22) for i in range(8)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    from rvi_big_data_api_spark.operators.ml_eval import _bt_strengths

    edges, items, s, n_pairs = _bt_strengths(spark, str(tmp_path))
    assert items == [] and s == {} and n_pairs == 0
    assert edges.count() == 0
    assert _df("eval_bradley_terry", spark, str(tmp_path)).count() == 0
    assert _df("corpus_reward_mix", spark, str(tmp_path)).count() == 0


# --- ADVICE r11 item 3: spearman overflow guard -------------------------------


def test_spearman_overflow_guard_is_in_plan_and_inert(spark, sf_dir):
    """The raise_error guard must be present in the plan (a wrong rho past
    N~1e6 would silently corrupt the readout otherwise) and must be inert
    at fixture scale: rho matches the pre-guard value."""
    df = _df("stats_spearman", spark, sf_dir)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "raise_error" in plan
    row = df.collect()[0]
    assert row["n"] > 0
    assert row["rho_spearman"] is not None
    assert -1.0 <= row["rho_spearman"] <= 1.0


# --- ml_gmm_quality: unsupervised EM trained in-engine ------------------------


def _py_gmm_traj(sf_dir):
    """Pure-Python replica of the quantized 2-component EM: exact integer
    scores from DuckDB, float E-step, quantized M-step — an independent
    path to the identical BIGINT trajectory."""
    import duckdb

    from rvi_big_data_api_spark.operators.ml_eval import (
        GMM_ITERS,
        GMM_MU1_0,
        GMM_MU2_0,
        GMM_PI1_0,
        GMM_PI_MIN_PPM,
        GMM_TWO_PI,
        GMM_VAR_0,
        GMM_VAR_MIN_MICRO,
    )

    xs = [
        r[0]
        for r in duckdb.sql(
            "SELECT (len(list_distinct(string_split(text, ' '))) * 1000000"
            " // len(string_split(text, ' ')))::BIGINT"
            f" FROM '{sf_dir}/documents.parquet'"
        ).fetchall()
    ]
    n = len(xs)
    sx = sum(xs)
    sxx = sum(x * x for x in xs)

    def dens(xp, m, v, p):
        mu, var = m / 1e6, v / 1e6
        return (
            (p / 1e6)
            * math.exp(-((xp / 1e6 - mu) ** 2) / (2 * var))
            / math.sqrt(GMM_TWO_PI * var)
        )

    m1, m2, v1, v2, p1 = GMM_MU1_0, GMM_MU2_0, GMM_VAR_0, GMM_VAR_0, GMM_PI1_0
    traj = []
    for t in range(1, GMM_ITERS + 1):
        sr = srx = srxx = 0.0
        for xp in xs:
            a1 = dens(xp, m1, v1, p1)
            a2 = dens(xp, m2, v2, 1_000_000 - p1)
            r = a1 / (a1 + a2)
            sr += r
            srx += r * (xp / 1e6)
            srxx += r * (xp / 1e6) ** 2
        sr2, srx2 = n - sr, sx / 1e6 - srx
        srxx2 = sxx / 1e12 - srxx
        m1 = math.floor(srx / sr * 1e6 + 0.5)
        m2 = math.floor(srx2 / sr2 * 1e6 + 0.5)
        v1 = max(
            math.floor((srxx / sr - (srx / sr) ** 2) * 1e6 + 0.5),
            GMM_VAR_MIN_MICRO,
        )
        v2 = max(
            math.floor((srxx2 / sr2 - (srx2 / sr2) ** 2) * 1e6 + 0.5),
            GMM_VAR_MIN_MICRO,
        )
        p1 = min(
            max(math.floor(sr / n * 1e6 + 0.5), GMM_PI_MIN_PPM),
            1_000_000 - GMM_PI_MIN_PPM,
        )
        ll = sum(
            math.log(
                dens(xp, m1, v1, p1) + dens(xp, m2, v2, 1_000_000 - p1)
            )
            for xp in xs
        ) / n
        traj.append((t, m1, m2, v1, v2, p1, round(ll, 6)))
    return traj


def test_gmm_matches_python_replica(spark, sf_dir):
    got = sorted(
        (
            r["iteration"],
            r["mu1_micro"],
            r["mu2_micro"],
            r["var1_micro"],
            r["var2_micro"],
            r["pi1_ppm"],
        )
        for r in _df("ml_gmm_quality", spark, sf_dir).collect()
    )
    exp = sorted(t[:6] for t in _py_gmm_traj(sf_dir))
    assert got == exp


def test_gmm_likelihood_ascends_and_components_separate(spark, sf_dir):
    """EM's monotone guarantee on the mean log-likelihood (readout under
    the NEW params each step), modulo the 1-micro quantization (tolerance
    1e-4 nats); the two fitted means must stay ordered and apart."""
    rows = sorted(
        _df("ml_gmm_quality", spark, sf_dir).collect(),
        key=lambda r: r["iteration"],
    )
    lls = [r["loglik"] for r in rows]
    for a, b in zip(lls, lls[1:]):
        assert b >= a - 1e-4, lls
    last = rows[-1]
    assert last["mu2_micro"] - last["mu1_micro"] > 100_000
    assert last["var1_micro"] >= 100 and last["var2_micro"] >= 100
    assert 1000 <= last["pi1_ppm"] <= 999_000


def test_gmm_posterior_sample_conservation(spark, sf_dir):
    """The posterior gate can only keep a subset, mean posterior is a
    valid ppm, and the sampler is deterministic (two runs agree)."""
    a = {
        r["source"]: r
        for r in _df("corpus_gmm_posterior_sample", spark, sf_dir).collect()
    }
    b = {
        r["source"]: r
        for r in _df("corpus_gmm_posterior_sample", spark, sf_dir).collect()
    }
    assert set(a) == set(b) and len(a) > 0
    for src, r in a.items():
        assert 0 <= r["n_kept"] <= r["n_docs"]
        assert 0 <= r["mean_posterior_ppm"] <= 1_000_000
        r2 = b[src]
        assert (r["n_kept"], r["kept_tokens"]) == (r2["n_kept"], r2["kept_tokens"])


# --- corpus_curated_select: three artifacts, one curated subset ---------------


def test_curated_select_quota_identity(spark, sf_dir):
    """Quotas must be EXACTLY corpus_reward_mix's ppm scaled to the stated
    budget (floor(mix_ppm * budget / 1e6)), and the selection can never
    exceed min(quota, pool): n_selected = least(quota_docs, n_eligible)."""
    from rvi_big_data_api_spark.operators.llm_text import CURATED_BUDGET_DOCS

    mix = {
        r["source"]: r["mix_weight_ppm"]
        for r in _df("corpus_reward_mix", spark, sf_dir).collect()
    }
    rows = _df("corpus_curated_select", spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["mix_weight_ppm"] == mix[r["source"]]
        assert (
            r["quota_docs"]
            == mix[r["source"]] * CURATED_BUDGET_DOCS // 1_000_000
        )
        assert r["n_selected"] == min(r["quota_docs"], r["n_eligible"])
        if r["n_selected"] == 0:
            assert r["selected_tokens"] == 0


def test_curated_select_rides_the_memos(spark, sf_dir):
    """Running the selector after its three producers must not retrain:
    the memo dicts hold exactly one artifact per (app, sf_dir) before and
    after."""
    from rvi_big_data_api_spark.operators.llm_text import (
        _LANG_ID_MODEL,
        _QC_WEIGHTS,
    )
    from rvi_big_data_api_spark.operators.ml_eval import _BT_FRAMES

    _df("corpus_curated_select", spark, sf_dir).collect()
    app = spark.sparkContext.applicationId
    keys = [(app, sf_dir)]
    before = [
        len([k for k in m if k in keys])
        for m in (_BT_FRAMES, _QC_WEIGHTS, _LANG_ID_MODEL)
    ]
    _df("corpus_curated_select", spark, sf_dir).collect()
    after = [
        len([k for k in m if k in keys])
        for m in (_BT_FRAMES, _QC_WEIGHTS, _LANG_ID_MODEL)
    ]
    assert before == after == [1, 1, 1]


# --- stats_kendall_tau / ts_mann_kendall: dominance-pair algebra --------------


def test_kendall_tau_matches_bruteforce(spark, sf_dir):
    """The support-grid dominance sums must equal the O(n^2) user-pair
    brute force (concordant/discordant/ties and tau_b)."""
    import duckdb

    pairs = duckdb.sql(
        "SELECT user_id,"
        " sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT,"
        " sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT"
        f" FROM '{sf_dir}/events.parquet' GROUP BY user_id"
    ).fetchall()
    xs = [(x, y) for _, x, y in pairs]
    n = len(xs)
    cc = dd = n1 = n2 = 0
    for i in range(n):
        for j in range(i + 1, n):
            dx = xs[i][0] - xs[j][0]
            dy = xs[i][1] - xs[j][1]
            if dx == 0:
                n1 += 1
            if dy == 0:
                n2 += 1
            if dx * dy > 0:
                cc += 1
            elif dx * dy < 0:
                dd += 1
    row = _df("stats_kendall_tau", spark, sf_dir).collect()[0]
    assert row["n"] == n
    assert row["concordant"] == cc
    assert row["discordant"] == dd
    n0 = n * (n - 1) // 2
    # tied_x counts pairs tied on x INCLUDING pairs also tied on y; the
    # brute force above counts the same way
    assert row["tied_x"] == n1 and row["tied_y"] == n2
    exp_tau = (cc - dd) / math.sqrt((n0 - n1) * (n0 - n2))
    assert abs(row["tau_b"] - exp_tau) < 1e-5


def test_mann_kendall_matches_bruteforce(spark, sf_dir):
    import duckdb

    daily = duckdb.sql(
        "SELECT event_type, date_trunc('day', ts) AS d,"
        " sum(floor(value * 100 + 0.5)::BIGINT)::BIGINT AS xc"
        f" FROM '{sf_dir}/events.parquet' GROUP BY 1, 2 ORDER BY 1, 2"
    ).fetchall()
    from collections import defaultdict

    series = defaultdict(list)
    for et, d, xc in daily:
        series[et].append(xc)
    got = {r["event_type"]: r for r in _df("ts_mann_kendall", spark, sf_dir).collect()}
    assert set(got) == set(series)
    for et, xs in series.items():
        s = sum(
            (1 if xs[j] > xs[i] else -1 if xs[j] < xs[i] else 0)
            for i in range(len(xs))
            for j in range(i + 1, len(xs))
        )
        n = len(xs)
        tie_term = 0
        from collections import Counter

        for t in Counter(xs).values():
            tie_term += t * (t - 1) * (2 * t + 5)
        var18 = n * (n - 1) * (2 * n + 5) - tie_term
        r = got[et]
        assert r["s_stat"] == s and r["n_days"] == n and r["var_x18"] == var18
        if s != 0 and var18 > 0:
            exp_z = (s - 1 if s > 0 else s + 1) / math.sqrt(var18 / 18.0)
            assert abs(r["z_mk"] - exp_z) < 1e-3


# --- ml_gmm_bic + stream gate: consumers of the memoized fit ------------------


def test_gmm_bic_consistency(spark, sf_dir):
    """delta_bic must equal the BIC identity on the emitted likelihoods,
    and loglik2 must match ml_gmm_quality's final readout."""
    bic = _df("ml_gmm_bic", spark, sf_dir).collect()[0]
    traj = sorted(
        _df("ml_gmm_quality", spark, sf_dir).collect(),
        key=lambda r: r["iteration"],
    )
    assert bic["loglik2"] == traj[-1]["loglik"]
    n = bic["n"]
    exp = round(
        (2 * math.log(n) - 2 * n * bic["loglik1"])
        - (5 * math.log(n) - 2 * n * bic["loglik2"]),
        4,
    )
    assert abs(bic["delta_bic"] - exp) < 1e-9
    # the mixture should beat one Gaussian on this bimodal-ish score axis
    assert bic["loglik2"] >= bic["loglik1"]


def test_stream_gmm_gate_equals_batch(spark, sf_dir):
    """The live ledger must equal corpus_gmm_posterior_sample row-for-row
    (one scoring expression, one quantizer — the reconciliation law)."""
    batch = sorted(
        map(tuple, _df("corpus_gmm_posterior_sample", spark, sf_dir).collect())
    )
    live = sorted(
        map(tuple, _df("stream_gmm_quality_gate", spark, sf_dir).collect())
    )
    assert batch == live


# --- ml_cox_ph: survival regression trained in-engine -------------------------


def _py_cox_traj(sf_dir):
    """Pure-Python replica: time-to-first-purchase cohort from DuckDB,
    Breslow partial-likelihood ascent with the quantized beta update."""
    import duckdb

    from rvi_big_data_api_spark.operators.ml_eval import (
        COX_ITERS,
        COX_STEP_X1M,
    )

    rows = duckdb.sql(
        "SELECT date_diff('day', first_day, COALESCE(purch_day, last_day)),"
        " CASE WHEN purch_day IS NOT NULL THEN 1 ELSE 0 END,"
        " views // 10 - 4 FROM ("
        " SELECT user_id, min(date_trunc('day', ts)) AS first_day,"
        " max(date_trunc('day', ts)) AS last_day,"
        " min(CASE WHEN event_type = 'purchase'"
        " THEN date_trunc('day', ts) END) AS purch_day,"
        " sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS views"
        f" FROM '{sf_dir}/events.parquet' GROUP BY user_id)"
    ).fetchall()
    ne = sum(e for _, e, _ in rows)
    bm = 0
    traj = []
    durs = sorted({d for d, _, _ in rows})
    for t in range(1, COX_ITERS + 1):
        grad = 0.0
        for td in durs:
            d_t = sum(e for d, e, _ in rows if d == td)
            if d_t == 0:
                continue
            sx_t = sum(e * x for d, e, x in rows if d == td)
            s0 = sum(math.exp(bm * x / 1e6) for d, _, x in rows if d >= td)
            s1 = sum(
                x * math.exp(bm * x / 1e6) for d, _, x in rows if d >= td
            )
            grad += sx_t - d_t * s1 / s0
        bm += math.floor(grad / ne * COX_STEP_X1M + 0.5)
        ll = 0.0
        for td in durs:
            d_t = sum(e for d, e, _ in rows if d == td)
            if d_t == 0:
                continue
            sx_t = sum(e * x for d, e, x in rows if d == td)
            s0 = sum(math.exp(bm * x / 1e6) for d, _, x in rows if d >= td)
            ll += (bm / 1e6) * sx_t - d_t * math.log(s0)
        traj.append((t, bm, ne, round(ll / ne, 6)))
    return traj


def test_cox_matches_python_replica(spark, sf_dir):
    got = sorted(
        (r["iteration"], r["beta_micro"], r["n_events"])
        for r in _df("ml_cox_ph", spark, sf_dir).collect()
    )
    exp = sorted(t[:3] for t in _py_cox_traj(sf_dir))
    assert got == exp


def test_cox_likelihood_ascends(spark, sf_dir):
    rows = sorted(
        _df("ml_cox_ph", spark, sf_dir).collect(),
        key=lambda r: r["iteration"],
    )
    lls = [r["loglik"] for r in rows]
    for a, b in zip(lls, lls[1:]):
        assert b >= a - 1e-5, lls
    assert rows[-1]["n_events"] > 0


# --- ts_granger_lag1 / text_burstiness ----------------------------------------


def test_granger_matches_numpy_ols(spark, sf_dir):
    """F and R^2 must match an independent least-squares path (normal
    equations solved by numpy) on the same lagged daily frame."""
    import duckdb
    import numpy as np

    daily = duckdb.sql(
        "SELECT date_trunc('day', ts) AS d,"
        " sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT,"
        " sum(CASE WHEN event_type = 'purchase'"
        " THEN floor(value * 100 + 0.5)::BIGINT ELSE 0 END)::BIGINT"
        f" FROM '{sf_dir}/events.parquet' GROUP BY 1 ORDER BY 1"
    ).fetchall()
    vx = [r[1] for r in daily]
    pc = [r[2] for r in daily]
    got = {r["direction"]: r for r in _df("ts_granger_lag1", spark, sf_dir).collect()}

    def fit(y, ly, lx):
        n = len(y)
        Xr = np.column_stack([np.ones(n), ly])
        Xu = np.column_stack([np.ones(n), ly, lx])
        y = np.array(y, dtype=float)
        br, *_ = np.linalg.lstsq(Xr, y, rcond=None)
        bu, *_ = np.linalg.lstsq(Xu, y, rcond=None)
        rss_r = float(((y - Xr @ br) ** 2).sum())
        rss_u = float(((y - Xu @ bu) ** 2).sum())
        tss = float(((y - y.mean()) ** 2).sum())
        f = max((rss_r - rss_u) / (rss_u / (n - 3)), 0.0)
        return f, 1 - rss_u / tss

    f_vp, r2_vp = fit(pc[1:], pc[:-1], vx[:-1])
    f_pv, r2_pv = fit(vx[1:], vx[:-1], pc[:-1])
    assert abs(got["views->purchases"]["f_stat"] - f_vp) < 1e-2
    assert abs(got["views->purchases"]["r2_unrestricted"] - r2_vp) < 1e-4
    assert abs(got["purchases->views"]["f_stat"] - f_pv) < 1e-2
    assert abs(got["purchases->views"]["r2_unrestricted"] - r2_pv) < 1e-4


def test_burstiness_matches_bruteforce(spark, sf_dir):
    import duckdb
    from collections import Counter, defaultdict

    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    n = len(docs)
    per = defaultdict(dict)
    for did, text in docs:
        for t, k in Counter(text.split(" ")).items():
            per[t][did] = k
    rows = _df("text_burstiness", spark, sf_dir).collect()
    assert len(rows) == 30
    for r in rows:
        ks = per[r["term"]]
        tot = sum(ks.values())
        skk = sum(k * k for k in ks.values())
        assert r["total_occ"] == tot and r["n_docs_with"] == len(ks)
        mean = tot / n
        exp_vmr = (skk / n - mean * mean) / mean
        assert abs(r["vmr"] - exp_vmr) < 1e-3, r["term"]
    # ranks are the top-K by total_occ with term tie-break
    totals = sorted(
        ((sum(ks.values()), t) for t, ks in per.items()),
        key=lambda p: (-p[0], p[1]),
    )
    exp_terms = [t for _, t in totals[:30]]
    got_terms = [r["term"] for r in sorted(rows, key=lambda r: r["rank"])]
    assert got_terms == exp_terms


# --- stats_g_test / ts_hurst_rs -----------------------------------------------


def test_g_test_matches_scipy_free_reference(spark, sf_dir):
    """G and Cramér's V against an independent Python contingency path."""
    import duckdb

    cells = duckdb.sql(
        "SELECT c.c_mktsegment, o.o_orderpriority, count(*)"
        f" FROM '{sf_dir}/orders.parquet' o"
        f" JOIN '{sf_dir}/customer.parquet' c ON c.c_custkey = o.o_custkey"
        " GROUP BY 1, 2"
    ).fetchall()
    n = sum(c for _, _, c in cells)
    rows = {}
    cols = {}
    for s, p, c in cells:
        rows[s] = rows.get(s, 0) + c
        cols[p] = cols.get(p, 0) + c
    g = chi2 = 0.0
    for s, p, c in cells:
        e = rows[s] * cols[p] / n
        g += 2 * c * math.log(c / e)
        chi2 += (c - e) ** 2 / e
    minrc = min(len(rows), len(cols)) - 1
    got = _df("stats_g_test", spark, sf_dir).collect()[0]
    assert got["n"] == n and got["n_cells"] == len(cells)
    assert got["dof"] == (len(rows) - 1) * (len(cols) - 1)
    assert abs(got["g_stat"] - g) < 1e-3
    assert abs(got["cramers_v"] - math.sqrt(chi2 / (n * minrc))) < 1e-5


def test_hurst_matches_bruteforce(spark, sf_dir):
    import duckdb

    from rvi_big_data_api_spark.operators.telemetry import HURST_SCALES

    xs = [
        r[0]
        for r in duckdb.sql(
            "SELECT sum(floor(value * 100 + 0.5)::BIGINT)::BIGINT"
            f" FROM '{sf_dir}/events.parquet'"
            " GROUP BY date_trunc('day', ts) ORDER BY date_trunc('day', ts)"
        ).fetchall()
    ]
    got = {r["scale_days"]: r for r in _df("ts_hurst_rs", spark, sf_dir).collect()}
    pts = []
    for w in HURST_SCALES:
        logs = []
        for b in range(len(xs) // w):
            blk = xs[b * w : (b + 1) * w]
            sw = sum(blk)
            sxx = sum(x * x for x in blk)
            cx = 0
            zs = []
            for i, x in enumerate(blk):
                cx += x
                zs.append(w * cx - (i + 1) * sw)
            r_scaled = max(zs) - min(zs)
            v_scaled = w * sxx - sw * sw
            if r_scaled > 0 and v_scaled > 0:
                logs.append(math.log(r_scaled / math.sqrt(v_scaled)))
        if logs:
            mlr = sum(logs) / len(logs)
            pts.append((math.log(w), mlr))
            assert got[w]["n_blocks"] == len(logs)
            assert abs(got[w]["mean_log_rs"] - mlr) < 1e-4
    k = len(pts)
    sx = sum(p[0] for p in pts)
    sy = sum(p[1] for p in pts)
    sxx = sum(p[0] ** 2 for p in pts)
    sxy = sum(p[0] * p[1] for p in pts)
    exp_h = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    for r in got.values():
        assert abs(r["hurst"] - exp_h) < 1e-3
    # a finite series' R/S Hurst lives in (0, 1)
    assert 0.0 < exp_h < 1.0


# --- text_bm25_topk / sim_hybrid_rrf ------------------------------------------


def test_bm25_matches_python_reference(spark, sf_dir):
    """BM25 micro-scores and ranks against an independent float-path
    Python implementation (quantization applied at the same per-(term,
    doc) point)."""
    import duckdb
    from collections import Counter

    from rvi_big_data_api_spark.operators.llm_text import (
        BM25_B_X100,
        BM25_K1_X10,
        BM25_NQUERIES,
        BM25_TOPK,
    )

    docs = dict(
        duckdb.sql(
            f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
        ).fetchall()
    )
    tf = {did: Counter(t.split(" ")) for did, t in docs.items()}
    dl = {did: sum(c.values()) for did, c in tf.items()}
    n = len(docs)
    avgdl = sum(dl.values()) / n
    df = Counter()
    for c in tf.values():
        df.update(c.keys())
    k1, b = BM25_K1_X10 / 10.0, BM25_B_X100 / 100.0

    def wq(did, term):
        idf = math.log((n - df[term] + 0.5) / (df[term] + 0.5) + 1.0)
        t = tf[did][term]
        return math.floor(
            idf * (t * (k1 + 1)) / (t + k1 * (1 - b + b * dl[did] / avgdl)) * 1e6
        )

    got = _df("text_bm25_topk", spark, sf_dir).collect()
    assert len(got) == BM25_NQUERIES * BM25_TOPK
    for qid in range(BM25_NQUERIES):
        scores = {}
        for did in docs:
            if did == qid:
                continue
            s = sum(
                qtf * wq(did, term)
                for term, qtf in tf[qid].items()
                if term in tf[did]
            )
            if s:
                scores[did] = s
        exp = sorted(scores.items(), key=lambda p: (-p[1], p[0]))[:BM25_TOPK]
        rows = sorted(
            (r for r in got if r["qid"] == qid), key=lambda r: r["rank"]
        )
        assert [(r["doc_id"], r["score_micro"]) for r in rows] == exp, qid


def test_hybrid_rrf_fusion_identity(spark, sf_dir):
    """Fused scores must equal the RRF identity over the two emitted
    rankings, and every hit must carry at least one provenance flag."""
    from rvi_big_data_api_spark.operators.llm_text import RRF_K, RRF_SCALE

    lex = {
        (r["qid"], r["doc_id"]): r["rank"]
        for r in _df("text_bm25_topk", spark, sf_dir).collect()
    }
    dense = {
        (r["qid"], r["vec_id"]): r["rank"]
        for r in _df("sim_topk", spark, sf_dir).collect()
    }
    for r in _df("sim_hybrid_rrf", spark, sf_dir).collect():
        key = (r["qid"], r["doc_id"])
        exp = 0
        if key in lex:
            exp += RRF_SCALE // (RRF_K + lex[key])
        if key in dense:
            exp += RRF_SCALE // (RRF_K + dense[key])
        assert r["rrf_x1e9"] == exp, key
        assert r["in_lexical"] == (1 if key in lex else 0)
        assert r["in_dense"] == (1 if key in dense else 0)
        assert r["in_lexical"] or r["in_dense"]


# --- win_drawdown / eval_hybrid_gain ------------------------------------------


def test_drawdown_matches_bruteforce(spark, sf_dir):
    import duckdb
    from collections import defaultdict

    daily = duckdb.sql(
        "SELECT event_type, date_trunc('day', ts),"
        " sum(floor(value * 100 + 0.5)::BIGINT)::BIGINT"
        f" FROM '{sf_dir}/events.parquet' GROUP BY 1, 2 ORDER BY 1, 2"
    ).fetchall()
    series = defaultdict(list)
    for et, d, xc in daily:
        series[et].append((d, xc))
    got = {r["event_type"]: r for r in _df("win_drawdown", spark, sf_dir).collect()}
    for et, pts in series.items():
        peak = -(10**18)
        mdd, trough = 0, None
        for d, xc in pts:
            peak = max(peak, xc)
            dd = peak - xc
            if dd > mdd or trough is None:
                if dd > mdd or (dd == mdd and trough is None):
                    mdd, trough = dd, d
        # earliest day achieving the max drawdown
        peak = -(10**18)
        firsts = []
        for d, xc in pts:
            peak = max(peak, xc)
            if peak - xc == mdd:
                firsts.append(d)
        r = got[et]
        assert r["max_drawdown_cents"] == mdd
        assert r["trough_day"] == min(firsts).strftime("%Y-%m-%d")
        assert r["n_days"] == len(pts)


def test_hybrid_gain_is_consistent_with_lists(spark, sf_dir):
    """Precision rows must be recomputable from the emitted search lists
    and the label table; the fused list must never list fewer relevant
    hits than zero and the table must carry all three searchers."""
    import duckdb

    labels = dict(
        duckdb.sql(
            f"SELECT vec_id, label FROM '{sf_dir}/embeddings.parquet'"
        ).fetchall()
    )
    lex = [(r["qid"], r["doc_id"]) for r in _df("text_bm25_topk", spark, sf_dir).collect()]
    dense = [(r["qid"], r["vec_id"]) for r in _df("sim_topk", spark, sf_dir).collect()]
    hyb = [(r["qid"], r["doc_id"]) for r in _df("sim_hybrid_rrf", spark, sf_dir).collect()]
    got = {r["searcher"]: r for r in _df("eval_hybrid_gain", spark, sf_dir).collect()}
    assert set(got) == {"lexical", "dense", "hybrid_rrf"}
    for name, lst in (("lexical", lex), ("dense", dense), ("hybrid_rrf", hyb)):
        rel = sum(1 for q, d in lst if labels[d] == labels[q])
        r = got[name]
        assert r["n_hits_listed"] == len(lst)
        assert r["n_relevant"] == rel
        assert r["precision_ppm"] == rel * 1_000_000 // len(lst)


# --- stream_drawdown_monitor / spiegelhalter / mix_anneal ---------------------


def test_stream_drawdown_equals_batch(spark, sf_dir):
    batch = sorted(map(tuple, _df("win_drawdown", spark, sf_dir).collect()))
    live = sorted(
        map(tuple, _df("stream_drawdown_monitor", spark, sf_dir).collect())
    )
    assert batch == live


def test_spiegelhalter_matches_python(spark, sf_dir):
    """Z recomputed from the emitted classifier probabilities (the
    corpus_classifier_filter quantization) in pure Python."""
    import duckdb

    from rvi_big_data_api_spark.operators.llm_text import _qc_weights

    w = _qc_weights(spark, sf_dir)[1][-1][1:5]
    rows = duckdb.sql(
        "SELECT CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 0"
        " THEN 1 ELSE 0 END,"
        " len(list_distinct(string_split(text, ' '))) * 1000000"
        " // len(string_split(text, ' ')) // 10000 - 50,"
        " n_chars // 100 - 3,"
        " len(string_split(text, ' ')) // 10 - 4"
        f" FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    num = den = 0
    for y, x1, x2, x3 in rows:
        zm = w[0] + w[1] * x1 + w[2] * x2 + w[3] * x3
        p = math.floor(1e6 / (1 + math.exp(-(zm / 1e6))))
        num += (y * 1_000_000 - p) * (1_000_000 - 2 * p)
        den += (1_000_000 - 2 * p) ** 2 * p * (1_000_000 - p)
    exp_z = num / math.sqrt(den)
    got = _df("eval_calibration_spiegelhalter", spark, sf_dir).collect()[0]
    assert got["n"] == len(rows)
    assert abs(got["z_spiegelhalter"] - exp_z) < 1e-3


def test_mix_anneal_endpoints_and_monotone(spark, sf_dir):
    """Epoch 0 must equal corpus_reward_mix's ppm exactly, the last epoch
    the uniform share, and every source's path must be monotone."""
    from rvi_big_data_api_spark.operators.ml_eval import ANNEAL_EPOCHS

    mix = {
        r["source"]: r["mix_weight_ppm"]
        for r in _df("corpus_reward_mix", spark, sf_dir).collect()
    }
    rows = _df("corpus_mix_anneal", spark, sf_dir).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], {})[r["epoch"]] = r["weight_ppm"]
    assert set(by_src) == set(mix)
    uni = 1_000_000 // len(mix)
    for src, path in by_src.items():
        assert len(path) == ANNEAL_EPOCHS
        assert path[0] == mix[src]
        assert path[ANNEAL_EPOCHS - 1] == uni
        deltas = [
            path[e + 1] - path[e] for e in range(ANNEAL_EPOCHS - 1)
        ]
        assert all(d >= 0 for d in deltas) or all(d <= 0 for d in deltas)


def test_cox_empty_event_guard(spark, tmp_path):
    """A cohort with zero purchase events must yield an empty trajectory,
    not a ZeroDivisionError (the _bt_strengths degenerate-guard sibling)."""
    import datetime

    rows = [
        (i, i, "view", 1.0, datetime.datetime(2024, 1, 1 + i % 5))
        for i in range(12)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string,"
        " value double, ts timestamp"
    )
    ev.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    assert _df("ml_cox_ph", spark, str(tmp_path)).count() == 0


# --- ml_ridge_regression / graph_ppr ------------------------------------------


def test_ridge_matches_numpy(spark, sf_dir):
    """Weights and R^2 against numpy's ridge solve on the same cohort."""
    import duckdb
    import numpy as np

    from rvi_big_data_api_spark.operators.ml_eval import RIDGE_LAMBDA_X1M

    rows = duckdb.sql(
        "SELECT sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) - 13,"
        " sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) - 13,"
        " sum(CASE WHEN event_type = 'purchase'"
        " THEN floor(value * 100 + 0.5)::BIGINT ELSE 0 END)"
        f" FROM '{sf_dir}/events.parquet' GROUP BY user_id"
    ).fetchall()
    X = np.array([[1.0, x1, x2] for x1, x2, _ in rows])
    y = np.array([float(v) for _, _, v in rows])
    lam = RIDGE_LAMBDA_X1M / 1e6
    P = np.diag([0.0, lam, lam])  # intercept unpenalized
    w = np.linalg.solve(X.T @ X + P, X.T @ y)
    rss = float(((y - X @ w) ** 2).sum())
    tss = float(((y - y.mean()) ** 2).sum())
    got = _df("ml_ridge_regression", spark, sf_dir).collect()[0]
    assert got["n"] == len(rows)
    assert abs(got["w_intercept"] - w[0]) < 1e-4
    assert abs(got["w_views"] - w[1]) < 1e-4
    assert abs(got["w_clicks"] - w[2]) < 1e-4
    assert abs(got["r2"] - (1 - rss / tss)) < 1e-5


def test_ppr_mass_and_locality(spark, sf_dir):
    """PPR mass stays bounded by 1 (walk + restarts conserve mass up to
    the dropped zero-mass nodes), seeds with edges carry positive mass,
    and every positive-mass node is within 2 hops of a seed."""
    from rvi_big_data_api_spark.operators.llm_sim import (
        PPR_SEEDS,
        sim_pair_edges,
    )

    rows = _df("graph_ppr", spark, sf_dir).collect()
    assert rows
    total = sum(r["ppr"] for r in rows)
    assert 0 < total <= 1.0 + 1e-6
    pairs = [
        (r["vec_a"], r["vec_b"])
        for r in sim_pair_edges(spark, sf_dir).select("vec_a", "vec_b").collect()
    ]
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    seeds = [s for s in range(PPR_SEEDS) if s in adj]
    within2 = set(seeds)
    for s in seeds:
        for n1 in adj.get(s, ()):
            within2.add(n1)
            within2 |= adj.get(n1, set())
    for r in rows:
        assert r["vec_id"] in within2, r["vec_id"]
        assert r["is_seed"] == (r["vec_id"] < PPR_SEEDS)


def test_stream_ridge_equals_batch(spark, sf_dir):
    """The online fit must equal the batch fit exactly — sufficient
    statistics are associative, so streaming ingest changes nothing."""
    batch = sorted(map(tuple, _df("ml_ridge_regression", spark, sf_dir).collect()))
    live = sorted(map(tuple, _df("stream_ridge_online", spark, sf_dir).collect()))
    assert batch == live
