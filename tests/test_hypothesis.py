"""Hypothesis property tests: invariants over GENERATED event tables, not
just the fixed fixtures. Examples are bounded (Spark jobs per example are
expensive) but explore gap patterns the fixture's statistics never hit —
bursts, exact-boundary gaps, single-user streams."""

from __future__ import annotations

import datetime as dt
from unittest import mock

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import rvi_big_data_api_spark.operators.telemetry as T

# per-user gap sequences in seconds: spans exact boundary (1800) and extremes
gap_lists = st.lists(
    st.sampled_from([1, 60, 1799, 1800, 1801, 3600, 86400]), min_size=0, max_size=8
)
user_tables = st.dictionaries(
    st.integers(min_value=1, max_value=4), gap_lists, min_size=1, max_size=3
)


def _events_df(spark, table):
    t0 = dt.datetime(2024, 1, 1)
    rows, eid = [], 0
    for user, gaps in table.items():
        ts = t0
        rows.append((eid, ts, user, "click", 1.0, "{}"))
        eid += 1
        for g in gaps:
            ts = ts + dt.timedelta(seconds=g)
            rows.append((eid, ts, user, "click", 1.0, "{}"))
            eid += 1
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )


@settings(max_examples=12, deadline=None, derandomize=True, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(table=user_tables)
def test_sessionize_invariants_hold_on_generated_streams(spark, table):
    ev = _events_df(spark, table)
    with mock.patch.object(T, "load", lambda s, d, n: ev):
        out = T.sessionized_events(spark, "ignored").collect()

    # (1) sessions partition events
    assert len(out) == ev.count()

    by_user: dict[int, list] = {}
    for r in sorted(out, key=lambda r: (r.user_id, r.sec, r.event_id)):
        by_user.setdefault(r.user_id, []).append(r)

    for user, rows in by_user.items():
        # (2) session ids are dense starting at 1 and non-decreasing in time
        sids = [r.session_id for r in rows]
        assert sids[0] == 1
        assert all(b - a in (0, 1) for a, b in zip(sids, sids[1:])), sids
        # (3) boundary law: split iff gap > G, exactly
        for a, b in zip(rows, rows[1:]):
            gap = b.sec - a.sec
            if gap > T.SESSION_GAP_S:
                assert b.session_id == a.session_id + 1, (user, gap)
            else:
                assert b.session_id == a.session_id, (user, gap)
