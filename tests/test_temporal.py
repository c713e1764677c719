"""Temporal joins (operators/temporal.py): as-of + bucketed range join."""

from __future__ import annotations

import duckdb

from gdal_spark import registry as R

SF = "/root/testdata/sf0.001"


def _events_con():
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    return con


def test_asof_match_is_latest_at_or_before():
    """Independent check (no ASOF JOIN): correlated max over the plain
    inequality join equals the oracle's ASOF result."""
    con = _events_con()
    naive = con.sql(
        """
WITH v AS (SELECT user_id, ts, max(event_id) AS ref_id FROM events
           WHERE event_type = 'view' GROUP BY user_id, ts),
c AS (SELECT event_id AS probe_id, user_id, ts FROM events WHERE event_type = 'click'),
best AS (
  SELECT c.probe_id, max(v.ts) AS bts
  FROM c JOIN v ON c.user_id = v.user_id AND v.ts <= c.ts GROUP BY c.probe_id
)
SELECT c.probe_id, v2.ref_id
FROM c LEFT JOIN best ON c.probe_id = best.probe_id
LEFT JOIN v ON FALSE
LEFT JOIN (SELECT user_id, ts, ref_id FROM v) v2
  ON best.bts = v2.ts AND c.user_id = v2.user_id
"""
    ).df()
    asof = con.sql(R.ORACLES["asof_join"]).df()
    a = dict(zip(naive.probe_id, naive.ref_id))
    b = dict(zip(asof.probe_id, asof.ref_id))
    def norm(d):
        return {k: (None if v != v else int(v)) for k, v in d.items()}
    assert norm(a) == norm(b)


def test_range_join_fixture_is_mixed():
    con = _events_con()
    df = con.sql(R.ORACLES["range_join_time"]).df()
    nz = int((df.n_in_window > 0).sum())
    assert 0 < nz < len(df)  # both the hit and the zero path exercised


def test_range_join_plan_single_shuffle_pair(spark):
    df = R.QUERIES["range_join_time"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
