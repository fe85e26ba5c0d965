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
