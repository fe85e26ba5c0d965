"""Round-11 additions: cross-operator invariants and golden checks.

Same discipline as test_round7/8/9/10_properties.py: every new operator gets
at least one property that a wrong implementation would fail, checked
against either an independent pure-Python replica or a conservation law
the algebra must obey.
"""

from __future__ import annotations

import hashlib
import math

from rvi_big_data_api_spark.io import load
from rvi_big_data_api_spark.registry import REGISTRY


def _df(name, spark, sf_dir):
    return REGISTRY[name].fn(spark, sf_dir)


# --- eval_bradley_terry: preference ranking trained in-engine -----------------


def _py_bt_edges(docs):
    """Pure-Python replica of the cross-source pair construction: per
    (lang, md5-nibble-of-doc_id) bucket pick the best/worst document by
    exact lexical-diversity ppm (ties on doc_id), keep wide-margin
    cross-source pairs, aggregate to (winner, loser) -> weight."""
    from collections import defaultdict

    from rvi_big_data_api_spark.operators.ml_eval import BT_MIN_MARGIN_PPM

    buckets = defaultdict(list)
    for doc_id, text, lang, source in docs:
        toks = text.split(" ")
        score = len(set(toks)) * 1_000_000 // len(toks)
        nib = hashlib.md5(str(doc_id).encode()).hexdigest()[0]
        buckets[(lang, nib)].append((score, doc_id, source))
    edges = defaultdict(int)
    for rows in buckets.values():
        # ORDER BY score DESC, doc_id ASC / score ASC, doc_id ASC
        best = min(rows, key=lambda r: (-r[0], r[1]))
        worst = min(rows, key=lambda r: (r[0], r[1]))
        if (
            best[1] != worst[1]
            and best[0] - worst[0] >= BT_MIN_MARGIN_PPM
            and best[2] != worst[2]
        ):
            edges[(best[2], worst[2])] += 1
    return dict(edges)


def _py_bt_train(edges, iters, step_x1m):
    """Pure-Python replica of the quantized BT gradient loop. Returns the
    strength trajectory [{item: sm}] (one entry per step, post-recenter)
    and the mean log-loss after each step (index 0 = before training)."""
    items = sorted({i for e in edges for i in e})
    ref = items[0]
    n = sum(edges.values())
    s = {i: 0 for i in items}

    def logloss():
        ll = 0.0
        for (wi, lo), w in edges.items():
            ll -= w * math.log(
                1.0 / (1.0 + math.exp(-((s[wi] - s[lo]) / 1e6)))
            )
        return ll / n

    losses = [logloss()]
    traj = []
    for _ in range(iters):
        g = {i: 0.0 for i in items}
        for (wi, lo), w in edges.items():
            p = 1.0 / (1.0 + math.exp(-((s[wi] - s[lo]) / 1e6)))
            g[wi] -= w * (1.0 - p)
            g[lo] += w * (1.0 - p)
        for i in items:
            s[i] -= math.floor(g[i] / n * step_x1m + 0.5)
        off = s[ref]
        for i in items:
            s[i] -= off
        traj.append(dict(s))
        losses.append(logloss())
    return traj, losses


def test_bradley_terry_matches_python_replica(spark, sf_dir):
    """Replay the pair construction AND all BT_ITERS quantized gradient
    steps driver-side from raw documents — integer strengths, win counts
    and exact win-rate ppm must match EXACTLY; pred_wins to 6dp noise."""
    from rvi_big_data_api_spark.operators.ml_eval import BT_ITERS, BT_STEP_X1M

    docs = [
        (r.doc_id, r.text, r.lang, r.source)
        for r in load(spark, sf_dir, "documents").collect()
    ]
    edges = _py_bt_edges(docs)
    traj, _ = _py_bt_train(edges, BT_ITERS, BT_STEP_X1M)
    final = traj[-1]
    wins = {i: 0 for i in final}
    games = {i: 0 for i in final}
    for (wi, lo), w in edges.items():
        wins[wi] += w
        games[wi] += w
        games[lo] += w
    pred = {i: 0.0 for i in final}
    for (wi, lo), w in edges.items():
        p = 1.0 / (1.0 + math.exp(-((final[wi] - final[lo]) / 1e6)))
        pred[wi] += w * p
        pred[lo] += w * (1.0 - p)
    got = {r["source"]: r for r in _df("eval_bradley_terry", spark, sf_dir).collect()}
    assert set(got) == set(final)
    for it in final:
        r = got[it]
        assert r["strength_micro"] == final[it], it
        assert r["n_wins"] == wins[it]
        assert r["n_games"] == games[it]
        assert r["win_rate_ppm"] == wins[it] * 1_000_000 // games[it]
        assert abs(r["pred_wins"] - pred[it]) < 2e-6, it


def test_bradley_terry_descent_gauge_and_calibration(spark, sf_dir):
    """Mathematical invariants: (1) lr = 0.5 is below the 1/L monotone-
    descent bound of the mean pairwise loss, so log-loss is non-increasing
    at every step and strictly lower at the end; (2) the gauge fix pins
    the lexicographically-first item at strength 0; (3) every game
    contributes p + (1-p) = 1, so sum(pred_wins) == total games; (4) the
    fit actually orders: strengths are not all zero."""
    from rvi_big_data_api_spark.operators.ml_eval import BT_ITERS, BT_STEP_X1M

    docs = [
        (r.doc_id, r.text, r.lang, r.source)
        for r in load(spark, sf_dir, "documents").collect()
    ]
    edges = _py_bt_edges(docs)
    _, losses = _py_bt_train(edges, BT_ITERS, BT_STEP_X1M)
    for a, b in zip(losses, losses[1:]):
        assert b <= a + 1e-9, losses
    assert losses[-1] < losses[0]
    rows = _df("eval_bradley_terry", spark, sf_dir).collect()
    ref = min(r["source"] for r in rows)
    by = {r["source"]: r for r in rows}
    assert by[ref]["strength_micro"] == 0
    n_games_total = sum(w for w in edges.values())
    assert abs(sum(r["pred_wins"] for r in rows) - n_games_total) < 1e-4
    assert any(r["strength_micro"] != 0 for r in rows)


# --- text_lang_id: naive-Bayes language identification ------------------------


def _py_lang_id(docs, gram=1):
    """Pure-Python replica of the quantized smoothed-NB classifier:
    micro-quantized log-probs (floor(ln * 1e6)), delta-vs-default scoring,
    argmax with (score desc, lang asc) tie-break. Returns
    {doc_id: (true_lang, pred_lang)}."""
    from collections import Counter, defaultdict

    feats = {}
    pc = defaultdict(Counter)
    nd = Counter()
    for doc_id, text, lang in docs:
        ws = [w for w in text.split(" ") if w]
        fs = (
            ws
            if gram == 1
            else [" ".join(ws[i : i + gram]) for i in range(len(ws) - gram + 1)]
        )
        feats[doc_id] = (lang, fs)
        pc[lang].update(fs)
        nd[lang] += 1
    tot = {L: sum(c.values()) for L, c in pc.items()}
    vocab = set().union(*pc.values()) if pc else set()
    v = len(vocab)
    n = sum(nd.values())
    defq = {L: math.floor(math.log(1.0 / (tot[L] + v)) * 1e6) for L in pc}
    prq = {L: math.floor(math.log(nd[L] / n) * 1e6) for L in pc}
    dllq = {
        L: {
            f: math.floor(math.log((c + 1) / (tot[L] + v)) * 1e6) - defq[L]
            for f, c in pc[L].items()
        }
        for L in pc
    }
    out = {}
    for doc_id, (lang, fs) in feats.items():
        tf = Counter(fs)
        best = None
        for L in sorted(pc):
            s = len(fs) * defq[L] + prq[L] + sum(
                c * dllq[L].get(f, 0) for f, c in tf.items()
            )
            if best is None or s > best[0]:
                best = (s, L)
        out[doc_id] = (lang, best[1])
    return out


def test_lang_id_matches_python_replica(spark, sf_dir):
    """Replay profile training, quantization and argmax driver-side from
    raw documents — the confusion matrix must match EXACTLY (integer
    scores make the argmax deterministic across engines)."""
    from collections import Counter

    docs = [
        (r.doc_id, r.text, r.lang)
        for r in load(spark, sf_dir, "documents").collect()
    ]
    picks = _py_lang_id(docs)
    want = Counter((t, p) for t, p in picks.values())
    lang_docs = Counter(t for t, _ in picks.values())
    got = {
        (r["lang"], r["pred_lang"]): (r["n_docs"], r["row_share_ppm"])
        for r in _df("text_lang_id", spark, sf_dir).collect()
    }
    assert set(got) == set(want)
    for cell, (n_docs, share) in got.items():
        assert n_docs == want[cell], cell
        assert share == want[cell] * 1_000_000 // lang_docs[cell[0]], cell


def test_lang_id_accuracy_floor_and_coverage(spark, sf_dir):
    """The classifier must beat uniform chance by 2x (the honest floor on
    this fixture: the synthetic languages share one vocabulary with
    near-identical frequencies, so Bayes-optimal is barely above the
    majority share — see the op docstring), classify EVERY document
    (confusion-matrix cells sum to the doc count), and keep each actual
    lang's row shares summing to ~1e6 ppm."""
    from collections import defaultdict

    rows = _df("text_lang_id", spark, sf_dir).collect()
    n_docs = load(spark, sf_dir, "documents").count()
    n_langs = load(spark, sf_dir, "documents").select("lang").distinct().count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    correct = sum(r["n_docs"] for r in rows if r["lang"] == r["pred_lang"])
    assert correct * n_langs > 2 * n_docs  # accuracy > 2x uniform chance
    shares = defaultdict(int)
    for r in rows:
        shares[r["lang"]] += r["row_share_ppm"]
    for lang, s in shares.items():
        # integer div truncation: cells lose < 1 ppm each
        assert 1_000_000 - len(rows) <= s <= 1_000_000, (lang, s)


# --- stream_seasonal_esd: live/offline reconciliation --------------------------


def test_stream_esd_equals_batch_esd(spark, sf_dir):
    """The no-drift law (VERDICT r10 item 6): the streaming twin and the
    batch op ride ONE extraction helper over identical daily cells, so
    their outputs must be row-for-row identical — the stream's flagged
    anomaly set IS the batch ESD flag set at the same K."""
    got_s = sorted(
        map(tuple, _df("stream_seasonal_esd", spark, sf_dir).collect())
    )
    got_b = sorted(
        map(tuple, _df("anomaly_seasonal_esd", spark, sf_dir).collect())
    )
    assert got_s == got_b
    assert len(got_s) > 0


# --- stats_spearman: support-histogram midrank correlation ---------------------


def test_spearman_matches_naive_python(spark, sf_dir):
    """The support-midrank construction must equal the textbook
    sort-assign-average-ties Spearman computed driver-side, and obey
    rho's range bound."""
    from collections import defaultdict

    ev = load(spark, sf_dir, "events").collect()
    acc = defaultdict(lambda: [0, 0])
    for e in ev:
        a = acc[e.user_id]
        if e.event_type == "view":
            a[0] += 1
        elif e.event_type == "purchase":
            a[1] += math.floor(e.value * 100 + 0.5)
    xs = [a[0] for a in acc.values()]
    ys = [a[1] for a in acc.values()]

    def midranks(vals):
        order = sorted(range(len(vals)), key=lambda i: vals[i])
        r = [0.0] * len(vals)
        i = 0
        while i < len(order):
            j = i
            while j < len(order) and vals[order[j]] == vals[order[i]]:
                j += 1
            mid = (i + 1 + j) / 2.0
            for k in range(i, j):
                r[order[k]] = mid
            i = j
        return r

    rx, ry = midranks(xs), midranks(ys)
    n = len(rx)
    sx, sy = sum(rx), sum(ry)
    sxx = sum(v * v for v in rx)
    syy = sum(v * v for v in ry)
    sxy = sum(a * b for a, b in zip(rx, ry))
    want = (n * sxy - sx * sy) / math.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    row = _df("stats_spearman", spark, sf_dir).collect()[0]
    assert row["n"] == n
    assert abs(row["rho_spearman"] - want) < 2e-6
    assert -1.0 <= row["rho_spearman"] <= 1.0
    # view counts always tie; spend cents are near-unique at sf0.001
    assert row["n_tied_x"] > 0 and row["n_tied_y"] >= 0


# --- text_readability: all-integer index identities ----------------------------


def test_readability_matches_python_counts(spark, sf_dir):
    """ARI/LIX in exact ppm must equal the driver-side integer replica."""
    from collections import defaultdict

    from rvi_big_data_api_spark.operators.llm_text import (
        ARI_CHARS_X1M,
        ARI_CONST_X1M,
        ARI_WORDS_X1M,
        LIX_LONG_LEN,
    )

    agg = defaultdict(lambda: [0, 0, 0, 0])  # docs, words, chars, long
    for r in load(spark, sf_dir, "documents").collect():
        ws = r.text.split(" ")
        a = agg[r.lang]
        a[0] += 1
        a[1] += len(ws)
        a[2] += sum(len(w) for w in ws)
        a[3] += sum(1 for w in ws if len(w) >= LIX_LONG_LEN)
    got = {r["lang"]: r for r in _df("text_readability", spark, sf_dir).collect()}
    assert set(got) == set(agg)
    for lang, (docs, words, chars, lw) in agg.items():
        r = got[lang]
        assert r["n_docs"] == docs and r["words"] == words and r["chars"] == chars
        assert r["mean_word_len_ppm"] == chars * 1_000_000 // words
        assert r["long_word_ppm"] == lw * 1_000_000 // words
        assert (
            r["ari_x1m"]
            == ARI_CHARS_X1M * chars // words
            + ARI_WORDS_X1M * words // docs
            - ARI_CONST_X1M
        )
        assert (
            r["lix_x1m"]
            == words * 1_000_000 // docs + 100 * (lw * 1_000_000 // words)
        )


# --- eval_brier_decomposition: the Murphy identity ------------------------------


def test_brier_murphy_identity_and_replica(spark, sf_dir):
    """BS = REL - RES + UNC must hold exactly (binned forecasts, in-bin
    observed rates — Murphy 1973), and every term must match a
    driver-side replica; smoothing must make REL nonzero."""
    from collections import defaultdict

    from rvi_big_data_api_spark.operators.ml_eval import BRIER_BINS, BRIER_BIN_W

    acc = defaultdict(lambda: [0, 0])  # views, y
    for e in load(spark, sf_dir, "events").collect():
        a = acc[e.user_id]
        if e.event_type == "view":
            a[0] += 1
        elif e.event_type == "purchase":
            if math.floor(e.value * 100 + 0.5) > 15000:
                a[1] = 1
    bins = defaultdict(lambda: [0, 0])
    for v, y in acc.values():
        b = min(v // BRIER_BIN_W, BRIER_BINS - 1)
        bins[b][0] += 1
        bins[b][1] += y
    n = sum(nb for nb, _ in bins.values())
    n_pos = sum(p for _, p in bins.values())
    obar = n_pos / n
    bs = rel = res = 0.0
    for nb, npos in bins.values():
        f = (npos + 1) / (nb + 2)
        o = npos / nb
        bs += npos * (1 - f) ** 2 + (nb - npos) * f * f
        rel += nb * (f - o) ** 2
        res += nb * (o - obar) ** 2
    bs, rel, res = bs / n, rel / n, res / n
    unc = obar * (1 - obar)
    assert abs(bs - (rel - res + unc)) < 1e-12  # the Murphy identity
    row = _df("eval_brier_decomposition", spark, sf_dir).collect()[0]
    assert row["n"] == n and row["n_bins"] == len(bins)
    assert row["pos_rate_ppm"] == n_pos * 1_000_000 // n
    ece = sum(nb * abs((npos + 1) / (nb + 2) - npos / nb) for nb, npos in bins.values()) / n
    mce = max(abs((npos + 1) / (nb + 2) - npos / nb) for nb, npos in bins.values())
    for name, want in [
        ("brier", bs), ("reliability", rel), ("resolution", res),
        ("uncertainty", unc), ("ece", ece), ("mce", mce),
    ]:
        assert abs(row[name] - want) < 2e-6, name
    assert row["ece"] <= row["mce"] + 1e-9
    assert row["reliability"] > 0  # Laplace smoothing de-calibrates in-sample


# --- ts_periodogram: Parseval-style share laws ----------------------------------


def test_periodogram_shares_and_dominance(spark, sf_dir):
    """Per channel: exactly one dominant period; the dominant period has
    the max share; shares are in [0, 1]; every (PGRAM_PMIN..PGRAM_PMAX)
    period is present; and a python replica agrees on the dominant
    period and shares."""
    from collections import defaultdict

    from rvi_big_data_api_spark.operators.telemetry import PGRAM_PMAX, PGRAM_PMIN

    rows = _df("ts_periodogram", spark, sf_dir).collect()
    by_ch = defaultdict(list)
    for r in rows:
        by_ch[r["event_type"]].append(r)
    # python replica from raw events
    daily = defaultdict(lambda: defaultdict(int))
    for e in load(spark, sf_dir, "events").collect():
        day = e.ts.date()
        daily[e.event_type][day] += math.floor(e.value * 100 + 0.5)
    for ch, rs in by_ch.items():
        assert sorted(r["period"] for r in rs) == list(
            range(PGRAM_PMIN, PGRAM_PMAX + 1)
        )
        doms = [r for r in rs if r["is_dominant"]]
        assert len(doms) == 1
        assert doms[0]["power_share"] == max(r["power_share"] for r in rs)
        assert all(0.0 <= r["power_share"] <= 1.0 for r in rs)
        days = sorted(daily[ch])
        xs = [daily[ch][d] for d in days]
        mean = sum(xs) / len(xs)
        powers = {}
        for p in range(PGRAM_PMIN, PGRAM_PMAX + 1):
            sc = sum(
                (x - mean) * math.cos(2 * math.pi * (t + 1) / p)
                for t, x in enumerate(xs)
            )
            ss = sum(
                (x - mean) * math.sin(2 * math.pi * (t + 1) / p)
                for t, x in enumerate(xs)
            )
            powers[p] = sc * sc + ss * ss
        tot = sum(powers.values())
        want_dom = min(powers, key=lambda p: (-powers[p], p))
        assert doms[0]["period"] == want_dom, ch
        for r in rs:
            assert abs(r["power_share"] - powers[r["period"]] / tot) < 2e-6


# --- stream_lang_drift: live/offline model reconciliation ------------------------


def test_stream_lang_drift_reconciles_with_batch_confusion(spark, sf_dir):
    """The drift monitor's predicted counts must equal text_lang_id's
    confusion-matrix COLUMN sums (same model, same argmax helper), and
    the drift identity pred_share - label_share must hold in exact ppm."""
    from collections import Counter

    conf = _df("text_lang_id", spark, sf_dir).collect()
    col_sums = Counter()
    for r in conf:
        col_sums[r["pred_lang"]] += r["n_docs"]
    n = sum(col_sums.values())
    drift = {r["pred_lang"]: r for r in _df("stream_lang_drift", spark, sf_dir).collect()}
    assert set(drift) == set(col_sums)
    for lang, r in drift.items():
        assert r["n_docs"] == col_sums[lang], lang
        assert r["pred_share_ppm"] == col_sums[lang] * 1_000_000 // n
        assert r["drift_ppm"] == r["pred_share_ppm"] - r["label_share_ppm"]


# --- stats_friedman: blocked midranks vs scipy-style replica ---------------------


def test_friedman_matches_python_replica(spark, sf_dir):
    """Replay the blocked midrank construction and the tie-corrected
    statistic driver-side; within-block doubled rank sums must telescope
    to k(k+1) per block (conservation)."""
    from collections import defaultdict

    daily = defaultdict(dict)
    for e in load(spark, sf_dir, "events").collect():
        d = str(e.ts.date())
        daily[d][e.event_type] = daily[d].get(e.event_type, 0) + math.floor(
            e.value * 100 + 0.5
        )
    k = len({ch for day in daily.values() for ch in day})
    blocks = {d: chs for d, chs in daily.items() if len(chs) == k}
    n = len(blocks)
    s2 = defaultdict(int)
    a2 = 0
    tied = 0
    for chs in blocks.values():
        vals = sorted(chs.values())
        for ch, x in chs.items():
            lt = sum(1 for v in vals if v < x)
            t = sum(1 for v in vals if v == x)
            r2 = 2 * lt + t + 1
            s2[ch] += r2
            a2 += r2 * r2
        for v in set(vals):
            if vals.count(v) > 1:
                tied += vals.count(v)
        # conservation: doubled ranks in a block sum to k(k+1)
        assert sum(
            2 * sum(1 for v in vals if v < x) + sum(1 for v in vals if v == x) + 1
            for x in chs.values()
        ) == k * (k + 1)
    ssq = sum((v / 2.0 - n * (k + 1) / 2.0) ** 2 for v in s2.values())
    want = (k - 1) * ssq / (a2 / 4.0 - n * k * (k + 1.0) ** 2 / 4.0)
    row = _df("stats_friedman", spark, sf_dir).collect()[0]
    assert row["k"] == k and row["n_blocks"] == n
    assert abs(row["chi2_friedman"] - want) < 2e-4
    assert 0.0 <= row["chi2_friedman"]


# --- eval_isotonic_calibration: PAV laws -----------------------------------------


def test_isotonic_matches_pav_and_optimality(spark, sf_dir):
    """The minimax fit must equal sequential pool-adjacent-violators,
    be non-decreasing, conserve mass (sum nb*f == sum npos), and beat
    the constant baseline's weighted MSE (PAV optimality over monotone
    fits; the constant obar is monotone)."""
    rows = sorted(
        _df("eval_isotonic_calibration", spark, sf_dir).collect(),
        key=lambda r: r["bin"],
    )
    # sequential PAV replica on the same bins
    pools = []  # (n, pos)
    for r in rows:
        pools.append([r["nb"], r["npos"]])
        while len(pools) > 1 and (
            pools[-2][1] * pools[-1][0] >= pools[-1][1] * pools[-2][0]
        ):
            n2, p2 = pools.pop()
            pools[-1][0] += n2
            pools[-1][1] += p2
    fits = []
    for n_, p_ in pools:
        fits.extend([p_ / n_] * 0)
    # expand pools back to bins
    expanded = []
    i = 0
    for n_, p_ in pools:
        covered = 0
        while covered < n_:
            covered += rows[i]["nb"]
            expanded.append(p_ / n_)
            i += 1
    for r, want in zip(rows, expanded):
        assert abs(r["iso_fit"] - want) < 2e-6, r["bin"]
    # monotone
    for a, b in zip(rows, rows[1:]):
        assert a["iso_fit"] <= b["iso_fit"] + 1e-12
    # mass conservation
    tot_pos = sum(r["npos"] for r in rows)
    assert abs(sum(r["nb"] * r["iso_fit"] for r in rows) - tot_pos) < 1e-2
    # optimality vs the constant monotone baseline
    n = sum(r["nb"] for r in rows)
    obar = tot_pos / n
    mse_iso = sum(
        r["nb"] * (r["npos"] / r["nb"] - r["iso_fit"]) ** 2 for r in rows
    )
    mse_const = sum(r["nb"] * (r["npos"] / r["nb"] - obar) ** 2 for r in rows)
    assert mse_iso <= mse_const + 1e-9


# --- scan_snapshot_timetravel: resolution laws ------------------------------------


def test_timetravel_resolution(spark, sf_dir):
    """latest resolves to the max version; AS-OF-timestamp between commits
    resolves DOWN (to v1); AS-OF-version is exact; and each resolved
    audit matches the raw key-slice recomputation."""
    rows = {r["travel_mode"]: r for r in _df("scan_snapshot_timetravel", spark, sf_dir).collect()}
    assert rows["latest"]["resolved_version"] == 3
    assert rows["as_of_timestamp"]["resolved_version"] == 1
    assert rows["as_of_version"]["resolved_version"] == 2
    o = [
        (r.o_orderkey, math.floor(r.o_totalprice * 100 + 0.5))
        for r in load(spark, sf_dir, "orders").collect()
    ]
    v1 = [(k, c) for k, c in o if k % 3 in (0, 1)]
    v3 = [(k, c) for k, c in o if k % 3 in (1, 2) or (k % 3 == 0 and c % 2 == 0)]
    assert rows["as_of_timestamp"]["n_rows"] == len(v1)
    assert rows["as_of_timestamp"]["total_cents"] == sum(c for _, c in v1)
    assert rows["as_of_version"]["n_rows"] == len(o)
    assert rows["latest"]["n_rows"] == len(v3)
    assert rows["latest"]["total_cents"] == sum(c for _, c in v3)


# --- privacy_entropy_ldiv: diversity laws ------------------------------------------


def test_entropy_ldiv_laws(spark, sf_dir):
    """Entropy <= ln(distinct_l) (uniform maximizes); entropy >= 0;
    a group with distinct_l == 1 has entropy 0 and fails recursive;
    recursive verdict matches a python replica from raw docs."""
    from collections import Counter, defaultdict

    from rvi_big_data_api_spark.operators.llm_text import LDIV_C, LDIV_L

    groups = defaultdict(Counter)
    for r in load(spark, sf_dir, "documents").collect():
        band = "short" if r.n_chars < 200 else ("medium" if r.n_chars < 800 else "long")
        groups[(r.source, r.lang, band)][r.doc_id % 10] += 1
    rows = _df("privacy_entropy_ldiv", spark, sf_dir).collect()
    assert len(rows) == len(groups)
    for r in rows:
        key = (r["source"], r["lang"], r["size_band"])
        cnt = groups[key]
        assert r["group_size"] == sum(cnt.values())
        assert r["distinct_l"] == len(cnt)
        assert -1e-9 <= r["entropy_nats"] <= math.log(r["distinct_l"]) + 1e-9
        ordered = sorted(cnt.values(), reverse=True)
        want = ordered[0] < LDIV_C * sum(ordered[LDIV_L - 1:])
        assert r["satisfies_recursive"] == want, key
        if r["distinct_l"] == 1:
            assert r["entropy_nats"] == 0.0 and not r["satisfies_recursive"]


# --- agg_distinct_growth / stream_distinct_growth ---------------------------------


def test_distinct_growth_laws_and_stream_twin(spark, sf_dir):
    """Conservation laws: active = new + returning per day; cumulative is
    non-decreasing and ends at the total distinct-user count; the first
    day has zero returning users; the streaming twin equals the batch op
    row-for-row."""
    rows = sorted(
        _df("agg_distinct_growth", spark, sf_dir).collect(),
        key=lambda r: r["day"],
    )
    total_users = (
        load(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    assert rows[0]["returning_users"] == 0
    prev = 0
    for r in rows:
        assert r["active_users"] == r["new_users"] + r["returning_users"]
        assert r["cumulative_distinct"] >= prev
        prev = r["cumulative_distinct"]
    assert rows[-1]["cumulative_distinct"] == total_users
    got_s = sorted(
        map(tuple, _df("stream_distinct_growth", spark, sf_dir).collect())
    )
    got_b = sorted(map(tuple, rows))
    assert got_s == got_b


# --- stats_proportion_ztest: replica + sign laws -----------------------------------


def test_proportion_ztest_matches_python(spark, sf_dir):
    """Exact-count replica; 0 <= z_continuity <= |z_pooled| + tolerance
    (the correction shrinks |z| toward zero, clamped at 0); exact ppm
    rates."""
    from collections import defaultdict

    arms = defaultdict(lambda: [0, 0])
    acc = defaultdict(int)
    for e in load(spark, sf_dir, "events").collect():
        if e.event_type == "purchase" and math.floor(e.value * 100 + 0.5) > 15000:
            acc[e.user_id] = 1
        else:
            acc.setdefault(e.user_id, 0)
    for uid, conv in acc.items():
        arm = "treatment" if hashlib.md5(str(uid).encode()).hexdigest()[0] >= "8" else "control"
        arms[arm][0] += 1
        arms[arm][1] += conv
    (n_c, x_c), (n_t, x_t) = arms["control"], arms["treatment"]
    row = _df("stats_proportion_ztest", spark, sf_dir).collect()[0]
    assert (row["n_c"], row["x_c"], row["n_t"], row["x_t"]) == (n_c, x_c, n_t, x_t)
    assert row["rate_c_ppm"] == x_c * 1_000_000 // n_c
    assert row["rate_t_ppm"] == x_t * 1_000_000 // n_t
    p = (x_c + x_t) / (n_c + n_t)
    se = math.sqrt(p * (1 - p) * (1 / n_c + 1 / n_t))
    z = (x_t / n_t - x_c / n_c) / se
    zc = max(abs(x_t / n_t - x_c / n_c) - (0.5 / n_c + 0.5 / n_t), 0.0) / se
    assert abs(row["z_pooled"] - z) < 2e-4
    assert abs(row["z_continuity"] - zc) < 2e-4
    assert 0.0 <= row["z_continuity"] <= abs(row["z_pooled"]) + 1e-9


# --- corpus_quality_classifier: rule-29 replica -------------------------------------


def test_quality_classifier_matches_python_replica(spark, sf_dir):
    """Replay all QC_ITERS quantized gradient steps from raw documents —
    integer weight trajectories exact, accuracy exact ppm, loss
    non-increasing (lr far below the smoothness bound on centered
    single-digit features)."""
    from rvi_big_data_api_spark.operators.llm_text import QC_ITERS, QC_STEP_X1M

    rows = []
    for r in load(spark, sf_dir, "documents").collect():
        toks = r.text.split(" ")
        x1 = len(set(toks)) * 1_000_000 // len(toks) // 10000 - 50
        x2 = r.n_chars // 100 - 3
        x3 = len(toks) // 10 - 4
        y = 1 if int(r.source[3:]) % 2 == 0 else 0
        rows.append((x1, x2, x3, y))
    n = len(rows)
    w = [0, 0, 0, 0]
    want = []
    for t in range(1, QC_ITERS + 1):
        g = [0.0] * 4
        for x1, x2, x3, y in rows:
            zm = w[0] + w[1] * x1 + w[2] * x2 + w[3] * x3
            p = 1.0 / (1.0 + math.exp(-(zm / 1e6)))
            g[0] += p - y
            g[1] += (p - y) * x1
            g[2] += (p - y) * x2
            g[3] += (p - y) * x3
        for k in range(4):
            w[k] -= math.floor(g[k] / n * QC_STEP_X1M + 0.5)
        correct, ll = 0, 0.0
        for x1, x2, x3, y in rows:
            zm = w[0] + w[1] * x1 + w[2] * x2 + w[3] * x3
            correct += int((zm >= 0) == (y == 1))
            ll += math.log(1.0 + math.exp(-(2 * y - 1) * (zm / 1e6)))
        want.append((t, *w, correct * 1_000_000 // n, round(ll / n, 6)))
    got = sorted(
        (r["iteration"], r["w0m"], r["w1m"], r["w2m"], r["w3m"],
         r["accuracy_ppm"], r["logloss"])
        for r in _df("corpus_quality_classifier", spark, sf_dir).collect()
    )
    for (gt, *gv), (wt, *wv) in zip(got, want):
        assert gt == wt
        assert gv[:4] == wv[:4], (gt, gv, wv)
        assert gv[4] == wv[4]
        assert abs(gv[5] - wv[5]) < 2e-6
    losses = [v[-1] for v in want]
    assert losses[-1] <= losses[0]


# --- composite_price_volume_mix: the Laspeyres identity ----------------------------


def test_pvm_identity(spark, sf_dir):
    """price + volume + cross must reconstruct the exact integer delta
    per brand (to rounding), and each brand trades in both years."""
    rows = _df("composite_price_volume_mix", spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        recon = r["price_effect"] + r["volume_effect"] + r["cross_effect"]
        assert abs(recon - r["delta_cents"]) < 0.02, r["brand"]
        assert r["rev0_cents"] > 0 and r["rev1_cents"] > 0


# --- corpus_reward_mix: softmax-mix laws --------------------------------------------


def test_reward_mix_laws(spark, sf_dir):
    """Mix weights sum to ~1e6 ppm; the weight order equals the strength
    order; the quantized softmax matches a python replica from the BT
    replica's strengths; and the op's strengths equal
    eval_bradley_terry's (one memoized fit)."""
    from rvi_big_data_api_spark.operators.ml_eval import BT_ITERS, BT_STEP_X1M

    docs = [
        (r.doc_id, r.text, r.lang, r.source)
        for r in load(spark, sf_dir, "documents").collect()
    ]
    traj, _ = _py_bt_train(_py_bt_edges(docs), BT_ITERS, BT_STEP_X1M)
    final = traj[-1]
    wq = {i: math.floor(math.exp(v / 1e6) * 1e6) for i, v in final.items()}
    tw = sum(wq.values())
    rows = {r["source"]: r for r in _df("corpus_reward_mix", spark, sf_dir).collect()}
    assert set(rows) == set(final)
    tot_ppm = sum(r["mix_weight_ppm"] for r in rows.values())
    assert 1_000_000 - len(rows) <= tot_ppm <= 1_000_000
    for it, r in rows.items():
        assert r["strength_micro"] == final[it]
        assert r["softmax_w_x1m"] == wq[it]
        assert r["mix_weight_ppm"] == wq[it] * 1_000_000 // tw
    bt = {r["source"]: r["strength_micro"]
          for r in _df("eval_bradley_terry", spark, sf_dir).collect()}
    assert bt == {i: r["strength_micro"] for i, r in rows.items()}
    ordered = sorted(rows.values(), key=lambda r: r["strength_micro"])
    for a, b in zip(ordered, ordered[1:]):
        assert a["mix_weight_ppm"] <= b["mix_weight_ppm"] + 1


# --- win_skyline_pareto: dominance laws ----------------------------------------------


def test_skyline_dominance(spark, sf_dir):
    """No survivor is strictly dominated within its brand; every
    non-survivor IS strictly dominated by some part in its brand —
    checked against a quadratic python replica."""
    from collections import defaultdict

    parts = defaultdict(list)
    for r in load(spark, sf_dir, "part").collect():
        parts[r.p_brand].append(
            (r.p_partkey, math.floor(r.p_retailprice * 100 + 0.5), r.p_size)
        )
    want = set()
    for brand, rows in parts.items():
        for k, pc, sz in rows:
            dominated = any(
                pc2 < pc and sz2 > sz for _, pc2, sz2 in rows
            )
            if not dominated:
                want.add((brand, k))
    got = {
        (r["brand"], r["p_partkey"])
        for r in _df("win_skyline_pareto", spark, sf_dir).collect()
    }
    assert got == want


# --- text_kneser_ney: smoothing laws -------------------------------------------------


def test_kneser_ney_laws(spark, sf_dir):
    """p_KN in (0, 1]; the discounted term never exceeds the MLE;
    per-row replica from raw counts; continuation mass conservation:
    sum over tails of n_hist equals the global bigram type count."""
    from collections import Counter

    from rvi_big_data_api_spark.operators.llm_text import KN_D_X100

    c2 = Counter()
    for r in load(spark, sf_dir, "documents").collect():
        ws = r.text.split(" ")
        for a, b in zip(ws, ws[1:]):
            c2[(a, b)] += 1
    c1 = Counter()
    fanout = Counter()
    cont = Counter()
    for (a, b), c in c2.items():
        c1[a] += c
        fanout[a] += 1
        cont[b] += 1
    n_types = len(c2)
    d = KN_D_X100 / 100.0
    rows = _df("text_kneser_ney", spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        key = (r["w1"], r["w2"])
        assert r["bigram_count"] == c2[key]
        assert r["w1_count"] == c1[r["w1"]]
        assert r["continuation_types"] == cont[r["w2"]]
        want = (
            max(c2[key] - d, 0.0) / c1[r["w1"]]
            + d * fanout[r["w1"]] / c1[r["w1"]] * cont[r["w2"]] / n_types
        )
        assert abs(r["p_kn"] - want) < 2e-6, key
        assert 0.0 < r["p_kn"] <= 1.0
        assert max(c2[key] - d, 0.0) / c1[r["w1"]] <= c2[key] / c1[r["w1"]]
    assert sum(cont.values()) == n_types


# --- seq_window_funnel: greedy-earliest optimality ------------------------------------


def test_window_funnel_matches_bruteforce(spark, sf_dir):
    """The greedy-earliest chain search must equal brute force over ALL
    strictly-increasing (view, click, purchase) chains under the
    deadline; the histogram telescopes to the user count."""
    from collections import defaultdict

    from rvi_big_data_api_spark.operators.telemetry import FUNNEL_W_SEC

    evs = defaultdict(lambda: {"view": [], "click": [], "purchase": []})
    for e in load(spark, sf_dir, "events").collect():
        if e.event_type in ("view", "click", "purchase"):
            evs[e.user_id][e.event_type].append(int(e.ts.timestamp()))
    want = defaultdict(int)
    for uid, d in evs.items():
        depth = 0
        if d["view"]:
            depth = 1
            for tv in d["view"]:
                if depth < 2 and any(
                    tv < tc <= tv + FUNNEL_W_SEC for tc in d["click"]
                ):
                    depth = 2
                if depth < 3 and any(
                    tv < tc < tp <= tv + FUNNEL_W_SEC
                    for tc in d["click"]
                    for tp in d["purchase"]
                    if tc > tv
                ):
                    depth = 3
        want[depth] += 1
    rows = {r["depth"]: r for r in _df("seq_window_funnel", spark, sf_dir).collect()}
    assert {k: v for k, v in want.items() if v} == {
        k: r["n_users"] for k, r in rows.items()
    }
    n = sum(want.values())
    assert sum(r["n_users"] for r in rows.values()) == n
    for r in rows.values():
        assert r["share_ppm"] == r["n_users"] * 1_000_000 // n


# --- eval_langid_kappa: chance-corrected agreement -----------------------------------


def test_langid_kappa_matches_confusion(spark, sf_dir):
    """kappa recomputed from text_lang_id's own confusion matrix must
    match (one shared model/argmax path); kappa <= 1; po/pe exact ppm."""
    conf = _df("text_lang_id", spark, sf_dir).collect()
    n = sum(r["n_docs"] for r in conf)
    agree = sum(r["n_docs"] for r in conf if r["lang"] == r["pred_lang"])
    from collections import Counter

    rowm, colm = Counter(), Counter()
    for r in conf:
        rowm[r["lang"]] += r["n_docs"]
        colm[r["pred_lang"]] += r["n_docs"]
    cross = sum(rowm[k] * colm.get(k, 0) for k in rowm)
    row = _df("eval_langid_kappa", spark, sf_dir).collect()[0]
    assert row["n"] == n and row["agree"] == agree
    assert row["po_ppm"] == agree * 1_000_000 // n
    assert row["pe_ppm"] == cross * 1_000_000 // (n * n)
    po, pe = agree / n, cross / (n * n)
    assert abs(row["kappa"] - (po - pe) / (1 - pe)) < 2e-6
    assert row["kappa"] <= 1.0


# --- ts_theil_sen: robustness and median laws -----------------------------------------


def test_theil_sen_matches_python_replica(spark, sf_dir):
    """Median-of-pairwise-slopes replica per channel; n_pairs =
    n_days*(n_days-1)/2; the estimator is exactly the textbook one."""
    from collections import defaultdict

    daily = defaultdict(lambda: defaultdict(int))
    for e in load(spark, sf_dir, "events").collect():
        daily[e.event_type][e.ts.date()] += math.floor(e.value * 100 + 0.5)
    rows = {r["event_type"]: r for r in _df("ts_theil_sen", spark, sf_dir).collect()}
    for ch, cells in daily.items():
        xs = [cells[d] for d in sorted(cells)]
        nd = len(xs)
        slopes = sorted(
            (xs[j] - xs[i]) / (j - i)
            for i in range(nd)
            for j in range(i + 1, nd)
        )
        np_ = len(slopes)
        med = (slopes[(np_ + 1) // 2 - 1] + slopes[np_ // 2]) / 2.0
        r = rows[ch]
        assert r["n_days"] == nd
        assert r["n_pairs"] == nd * (nd - 1) // 2 == np_
        assert abs(r["slope_theilsen"] - med) < 2e-6, ch


# --- corpus_classifier_filter: policy laws --------------------------------------------


def test_classifier_filter_laws(spark, sf_dir):
    """Ledger telescopes to the doc count; kept counts bounded by n_docs;
    verdicts recompute exactly from the trained weights (python replica
    of logit + quantized sigmoid + md5 uniform)."""
    from collections import defaultdict

    from rvi_big_data_api_spark.operators.llm_text import QC_ITERS, QC_STEP_X1M

    # retrain driver-side (the test_quality_classifier replica)
    feats = []
    for r in load(spark, sf_dir, "documents").collect():
        toks = r.text.split(" ")
        x1 = len(set(toks)) * 1_000_000 // len(toks) // 10000 - 50
        x2 = r.n_chars // 100 - 3
        x3 = len(toks) // 10 - 4
        y = 1 if int(r.source[3:]) % 2 == 0 else 0
        feats.append((r.doc_id, r.source, x1, x2, x3, y))
    n = len(feats)
    w = [0, 0, 0, 0]
    for _ in range(QC_ITERS):
        g = [0.0] * 4
        for _, _, x1, x2, x3, y in feats:
            zm = w[0] + w[1] * x1 + w[2] * x2 + w[3] * x3
            pr = 1.0 / (1.0 + math.exp(-(zm / 1e6)))
            g[0] += pr - y
            g[1] += (pr - y) * x1
            g[2] += (pr - y) * x2
            g[3] += (pr - y) * x3
        for k in range(4):
            w[k] -= math.floor(g[k] / n * QC_STEP_X1M + 0.5)
    want = defaultdict(lambda: [0, 0, 0])  # n, kept_thr, kept_samp
    for doc_id, source, x1, x2, x3, _ in feats:
        zm = w[0] + w[1] * x1 + w[2] * x2 + w[3] * x3
        u = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) % 1_000_000
        p_ppm = math.floor(1_000_000.0 / (1.0 + math.exp(-(zm / 1e6))))
        a = want[source]
        a[0] += 1
        a[1] += int(zm >= 0)
        a[2] += int(u < p_ppm)
    rows = {r["source"]: r for r in _df("corpus_classifier_filter", spark, sf_dir).collect()}
    assert set(rows) == set(want)
    for src, (nd, kt, ks) in want.items():
        r = rows[src]
        assert (r["n_docs"], r["kept_threshold"], r["kept_sampled"]) == (nd, kt, ks), src
        assert r["kept_sampled_ppm"] == ks * 1_000_000 // nd
        assert 0 <= r["kept_threshold"] <= r["n_docs"]


# --- ts_unit_root_df / stats_bartlett / eval_mcc replicas ------------------------------


def test_unit_root_matches_python(spark, sf_dir):
    """OLS-on-lagged-level replica per channel; verdicts far from the
    critical boundary (ulp-safety claim in the docstring)."""
    from collections import defaultdict

    from rvi_big_data_api_spark.operators.telemetry import DF_CRIT_5PCT_X100

    daily = defaultdict(lambda: defaultdict(int))
    for e in load(spark, sf_dir, "events").collect():
        daily[e.event_type][e.ts.date()] += math.floor(e.value * 100 + 0.5)
    rows = {r["event_type"]: r for r in _df("ts_unit_root_df", spark, sf_dir).collect()}
    for ch, cells in daily.items():
        xs = [cells[d] for d in sorted(cells)]
        obs = [(xs[i] - xs[i - 1], xs[i - 1]) for i in range(1, len(xs))]
        n = len(obs)
        sx = sum(x for _, x in obs)
        sy = sum(d for d, _ in obs)
        sxx = sum(x * x for _, x in obs)
        sxy = sum(d * x for d, x in obs)
        syy = sum(d * d for d, _ in obs)
        gamma = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        sse = (syy - sy * sy / n) - gamma * (sxy - sx * sy / n)
        se = math.sqrt(sse / (n - 2) / (sxx - sx * sx / n))
        t = gamma / se
        r = rows[ch]
        assert r["n"] == n
        assert abs(r["gamma_hat"] - gamma) < 2e-6
        assert abs(r["t_stat"] - t) < 2e-4
        assert r["stationary_5pct"] == (t < DF_CRIT_5PCT_X100 / 100.0)
        assert abs(t - DF_CRIT_5PCT_X100 / 100.0) > 0.01, ch  # off-boundary


def test_bartlett_matches_python(spark, sf_dir):
    """Exact-moment replica; the statistic is non-negative."""
    from collections import defaultdict

    seg = {
        r.c_custkey: r.c_mktsegment
        for r in load(spark, sf_dir, "customer").collect()
    }
    groups = defaultdict(list)
    for r in load(spark, sf_dir, "orders").collect():
        groups[seg[r.o_custkey]].append(math.floor(r.o_totalprice * 100 + 0.5))
    gv = {
        g: (len(v), sum(v), sum(x * x for x in v))
        for g, v in groups.items()
        if len(v) >= 2
    }
    k = len(gv)
    nn = sum(n for n, _, _ in gv.values())
    variances = {g: (ss - s * s / n) / (n - 1) for g, (n, s, ss) in gv.items()}
    pooled = sum((gv[g][0] - 1) * variances[g] for g in gv) / (nn - k)
    num = (nn - k) * math.log(pooled) - sum(
        (gv[g][0] - 1) * math.log(variances[g]) for g in gv
    )
    c = 1.0 + (sum(1.0 / (gv[g][0] - 1) for g in gv) - 1.0 / (nn - k)) / (
        3.0 * (k - 1)
    )
    row = _df("stats_bartlett", spark, sf_dir).collect()[0]
    assert row["k"] == k and row["n"] == nn
    assert abs(row["bartlett_stat"] - num / c) < 2e-3
    assert row["bartlett_stat"] >= 0.0


def test_mcc_consistent_with_filter(spark, sf_dir):
    """The MCC confusion must reconcile with corpus_classifier_filter's
    threshold ledger (same weights, same boundary): TP + FP == total
    kept_threshold; cells telescope to the doc count; |MCC| <= 1."""
    row = _df("eval_mcc", spark, sf_dir).collect()[0]
    n_docs = load(spark, sf_dir, "documents").count()
    assert row["tp"] + row["fp"] + row["tn"] + row["fn"] == n_docs
    kept = sum(
        r["kept_threshold"]
        for r in _df("corpus_classifier_filter", spark, sf_dir).collect()
    )
    assert row["tp"] + row["fp"] == kept
    assert -1.0 <= row["mcc"] <= 1.0
    assert row["accuracy_ppm"] == (row["tp"] + row["tn"]) * 1_000_000 // n_docs


# --- ts_holt_winters: seasonal-state laws ----------------------------------------------


def test_holt_winters_matches_python_and_reduces_error(spark, sf_dir):
    """Full sequential replica (identical op order); and the seasonal
    model's one-step squared error stays within a sane band of
    ts_holt_linear's over the back half of each series (the fixture's
    weekly signal is WEAK, so the untuned third state does not dominate
    — the op's docstring states this; the pin is stability, not a win)."""
    from collections import defaultdict

    daily = defaultdict(dict)
    for e in load(spark, sf_dir, "events").collect():
        d = str(e.ts.date())
        daily[e.event_type][d] = daily[e.event_type].get(d, 0) + math.floor(
            e.value * 100 + 0.5
        )
    rows = defaultdict(dict)
    for r in _df("ts_holt_winters", spark, sf_dir).collect():
        rows[r["event_type"]][r["day"]] = r
    lin = defaultdict(dict)
    for r in _df("ts_holt_linear", spark, sf_dir).collect():
        lin[r["event_type"]][r["day"]] = r
    for ch, cells in daily.items():
        days = sorted(cells)
        x = [float(cells[d]) for d in days]
        sh = [0.0] * 7
        lvl, trd = x[0], 0.0
        got = rows[ch]
        assert abs(got[days[0]]["level"] - lvl) < 1e-6
        hw_se = lin_se = 0.0
        half = len(days) // 2
        for t in range(1, len(days)):
            # forecast made at t-1 for t
            if t > half:
                prev = got[days[t - 1]]
                hw_se += (prev["forecast_1"] - x[t]) ** 2
                lp = lin[ch][days[t - 1]]
                lin_se += (lp["level"] + lp["trend"] - x[t]) ** 2
            s_lag = sh[0]
            new_l = 0.5 * (x[t] - s_lag) + 0.5 * (lvl + trd)
            new_b = 0.25 * (new_l - lvl) + 0.75 * trd
            new_s = 0.5 * (x[t] - new_l) + 0.5 * s_lag
            sh = sh[1:] + [new_s]
            lvl, trd = new_l, new_b
            r = got[days[t]]
            assert abs(r["level"] - new_l) < 5e-4
            assert abs(r["trend"] - new_b) < 5e-4
            assert abs(r["seasonal"] - new_s) < 5e-4
            assert abs(r["forecast_1"] - (new_l + new_b + sh[0])) < 5e-4
        assert 0.1 * lin_se < hw_se < 5.0 * lin_se, (ch, hw_se, lin_se)


# --- text_heaps_law: growth-curve laws --------------------------------------------------


def test_heaps_law_matches_python(spark, sf_dir):
    """Cumulative tokens/vocab/hapax replica in doc_id order; the curve is
    monotone; the final vocab equals the corpus vocab; hapax <= vocab;
    beta in (0, 1] for any real corpus."""
    docs = sorted(
        (r.doc_id, r.text) for r in load(spark, sf_dir, "documents").collect()
    )
    from collections import Counter

    from rvi_big_data_api_spark.operators.llm_text import HEAPS_CHECKPOINTS

    nd = len(docs)
    first_cp = {}
    occ = Counter()
    toks_per_cp = Counter()
    for i, (_, text) in enumerate(docs):
        cp = min((i * HEAPS_CHECKPOINTS) // nd + 1, HEAPS_CHECKPOINTS)
        ws = text.split(" ")
        toks_per_cp[cp] += len(ws)
        for w in ws:
            occ[w] += 1
            first_cp.setdefault(w, cp)
    rows = sorted(
        _df("text_heaps_law", spark, sf_dir).collect(),
        key=lambda r: r["checkpoint"],
    )
    cum_t = cum_v = cum_h = 0
    prev_v = 0
    for r in rows:
        cp = r["checkpoint"]
        cum_t += toks_per_cp[cp]
        cum_v += sum(1 for w, c in first_cp.items() if c == cp)
        cum_h += sum(1 for w, c in first_cp.items() if c == cp and occ[w] == 1)
        assert r["cum_tokens"] == cum_t
        assert r["cum_vocab"] == cum_v
        assert r["cum_hapax"] == cum_h
        assert r["cum_vocab"] >= prev_v
        assert r["cum_hapax"] <= r["cum_vocab"]
        prev_v = r["cum_vocab"]
    assert rows[-1]["cum_vocab"] == len(first_cp)
    # the synthetic 31-word vocab SATURATES at the first checkpoint, so the
    # fitted growth exponent is exactly 0 here (stated in the op docstring);
    # a natural corpus gives beta in (0.4, 0.6)
    assert 0.0 <= rows[0]["heaps_beta"] <= 1.0


# --- stats_cochran_q: paired-binary replica ----------------------------------------------


def test_cochran_q_matches_python(spark, sf_dir):
    """Exact-count replica; Q >= 0; the k = 2 special case of the same
    formula reduces to McNemar's chi2 without correction (identity
    checked on treatments 1/2)."""
    from collections import defaultdict

    flags = defaultdict(lambda: [0, 0, 0, 0])
    for e in load(spark, sf_dir, "events").collect():
        a = flags[e.user_id]
        if e.event_type == "view":
            a[0] = 1
        elif e.event_type == "click":
            a[1] = 1
        elif e.event_type == "purchase" and math.floor(e.value * 100 + 0.5) > 15000:
            a[2] = 1
        elif e.event_type == "signup":
            a[3] = 1
    n = len(flags)
    cols = [sum(a[j] for a in flags.values()) for j in range(4)]
    sr = sum(sum(a) for a in flags.values())
    srr = sum(sum(a) ** 2 for a in flags.values())
    q = 4 * 3 * sum((c - sr / 4.0) ** 2 for c in cols) / (4.0 * sr - srr)
    row = _df("stats_cochran_q", spark, sf_dir).collect()[0]
    assert row["n"] == n
    assert [row["c1"], row["c2"], row["c3"], row["c4"]] == cols
    assert abs(row["cochran_q"] - q) < 2e-4
    assert row["cochran_q"] >= 0.0
    # k=2 reduction: Q == (b-c)^2/(b+c) on treatments (view, click)
    b = sum(1 for a in flags.values() if a[0] == 1 and a[1] == 0)
    c = sum(1 for a in flags.values() if a[0] == 0 and a[1] == 1)
    if b + c:
        cols2 = [sum(a[0] for a in flags.values()), sum(a[1] for a in flags.values())]
        sr2 = sum(a[0] + a[1] for a in flags.values())
        srr2 = sum((a[0] + a[1]) ** 2 for a in flags.values())
        q2 = 2 * 1 * sum((x - sr2 / 2.0) ** 2 for x in cols2) / (2.0 * sr2 - srr2)
        assert abs(q2 - (b - c) ** 2 / (b + c)) < 1e-9


# --- eval_tost_equivalence: TOST laws ------------------------------------------------------


def test_tost_matches_python_and_is_off_boundary(spark, sf_dir):
    """Exact-count replica; z_lower + z_upper == 2m/se (identity); the
    verdict equals min(z) > z*; and min(z) sits off the 1.645 boundary."""
    from collections import defaultdict

    from rvi_big_data_api_spark.operators.ml_eval import (
        TOST_MARGIN_PPM,
        TOST_Z_X1000,
    )

    acc = defaultdict(int)
    for e in load(spark, sf_dir, "events").collect():
        if e.event_type == "purchase" and math.floor(e.value * 100 + 0.5) > 15000:
            acc[e.user_id] = 1
        else:
            acc.setdefault(e.user_id, 0)
    arms = defaultdict(lambda: [0, 0])
    for uid, conv in acc.items():
        arm = "treatment" if hashlib.md5(str(uid).encode()).hexdigest()[0] >= "8" else "control"
        arms[arm][0] += 1
        arms[arm][1] += conv
    (n_c, x_c), (n_t, x_t) = arms["control"], arms["treatment"]
    p_c, p_t = x_c / n_c, x_t / n_t
    diff = p_t - p_c
    se = math.sqrt(p_c * (1 - p_c) / n_c + p_t * (1 - p_t) / n_t)
    m = TOST_MARGIN_PPM / 1e6
    row = _df("eval_tost_equivalence", spark, sf_dir).collect()[0]
    assert (row["n_c"], row["x_c"], row["n_t"], row["x_t"]) == (n_c, x_c, n_t, x_t)
    assert abs(row["z_lower"] - (diff + m) / se) < 2e-4
    assert abs(row["z_upper"] - (m - diff) / se) < 2e-4
    assert abs((row["z_lower"] + row["z_upper"]) - 2 * m / se) < 4e-4
    zmin = min((diff + m) / se, (m - diff) / se)
    assert row["equivalent_5pct"] == (zmin > TOST_Z_X1000 / 1000.0)
    assert abs(zmin - TOST_Z_X1000 / 1000.0) > 0.01


# --- stream_decayed_topk: decay laws ---------------------------------------------------------


def test_decayed_topk_matches_python(spark, sf_dir):
    """Exact power-of-two decay replica; ranks dense 1..K; scores
    non-increasing; score <= raw * 2^30 always (weights cap at age 0)."""
    from collections import defaultdict

    from rvi_big_data_api_spark.streaming.streams import (
        DECAY_MAX_AGE,
        DECAY_TOPK_K,
    )

    cells = defaultdict(lambda: defaultdict(int))
    for e in load(spark, sf_dir, "events").collect():
        if e.event_type == "purchase":
            cells[e.user_id][e.ts.date()] += math.floor(e.value * 100 + 0.5)
    amax = max(d for u in cells.values() for d in u)
    scores = {}
    for uid, days in cells.items():
        s = sum(
            c * (1 << (DECAY_MAX_AGE - min((amax - d).days, DECAY_MAX_AGE)))
            for d, c in days.items()
        )
        scores[uid] = (s, sum(days.values()))
    want = sorted(scores.items(), key=lambda kv: (-kv[1][0], kv[0]))[:DECAY_TOPK_K]
    rows = sorted(
        _df("stream_decayed_topk", spark, sf_dir).collect(),
        key=lambda r: r["rnk"],
    )
    assert [r["rnk"] for r in rows] == list(range(1, len(want) + 1))
    for r, (uid, (s, raw)) in zip(rows, want):
        assert r["user_id"] == uid and r["score_x2_30"] == s and r["raw_cents"] == raw
        assert r["score_x2_30"] <= raw * (1 << DECAY_MAX_AGE)
    for a, b in zip(rows, rows[1:]):
        assert a["score_x2_30"] >= b["score_x2_30"]
