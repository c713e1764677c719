"""Temporal joins the reference lacks but a training-data pipeline needs
(per the driver mandate: as-of join, range join — the event-attribution
primitives for interleaved event/doc corpora).

Both operators avoid the naive per-row range scan:

* ``asof_join`` uses the UNION-MERGE construction: probe and reference
  rows are tagged and unioned, one shuffle+sort per key, and a running
  ``last(ref_id) IGNORE NULLS`` window carries the latest reference at
  or before each probe — O(n log n) per key, no range explosion, no
  broadcast.  This is the scalable shape of DuckDB's ASOF JOIN (which
  the oracle uses directly) and pandas.merge_asof.
* ``range_join_time`` buckets timestamps at the window width and
  equi-joins on (key, bucket) for the two candidate buckets, then
  applies the exact range predicate — the bucketed range join; reducer
  keys are (user, 5-minute bucket), skew-bounded by per-user rate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    probes: DataFrame,
    refs: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    probe_id: str = "probe_id",
    ref_id: str = "ref_id",
) -> DataFrame:
    """For each probe row, the reference row with the LATEST ts <= probe
    ts for the same key (inclusive; ties on ref ts resolved to the max
    ref_id).  LEFT semantics: probes with no prior reference keep NULL.

    Output: (probe_id, key, ts, ref_id)."""
    # dedup references to one per (key, ts): max ref_id — makes the
    # match deterministic in both engines
    r = refs.groupBy(key, ts).agg(F.max(ref_id).alias(ref_id))
    tagged = r.select(
        key, ts, F.lit(0).alias("_p"), F.col(ref_id).alias("_rid"),
        F.lit(None).cast("long").alias("_pid"),
    ).unionByName(
        probes.select(
            key, ts, F.lit(1).alias("_p"),
            F.lit(None).cast("long").alias("_rid"),
            F.col(probe_id).alias("_pid"),
        )
    )
    # refs sort BEFORE probes at equal ts (_p ascending) => inclusive <=
    w = (
        Window.partitionBy(key)
        .orderBy(ts, "_p")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = tagged.withColumn("_match", F.last("_rid", ignorenulls=True).over(w))
    return out.filter(F.col("_p") == 1).select(
        F.col("_pid").alias(probe_id), key, ts, F.col("_match").alias(ref_id)
    )


def range_join_time(
    probes: DataFrame,
    refs: DataFrame,
    window_s: int,
    key: str = "user_id",
    ts: str = "ts",
    probe_id: str = "probe_id",
) -> DataFrame:
    """Count reference rows per probe with ref ts in the HALF-OPEN
    window (probe_ts - window_s, probe_ts]; per-key.  Bucketed: each
    probe explodes into its own and the previous width-`window_s`
    bucket, candidates equi-join on (key, bucket), the exact predicate
    filters.  Output: (probe_id, key, ts, n_in_window) — probes with no
    match keep 0 (left semantics via the final join back)."""
    eps = F.unix_micros(F.col(ts).cast("timestamp"))  # parquet NTZ -> session-tz (UTC)
    bkt = (eps / (window_s * 1_000_000)).cast("long")
    r = refs.select(key, bkt.alias("_b"), eps.alias("_rus"))
    p = probes.select(probe_id, key, ts, eps.alias("_pus"), bkt.alias("_b0"))
    cand = p.select(
        probe_id, key, ts, "_pus",
        F.explode(F.array(F.col("_b0"), F.col("_b0") - 1)).alias("_b"),
    )
    hits = (
        cand.join(r, [key, "_b"])
        .filter(
            (F.col("_rus") > F.col("_pus") - window_s * 1_000_000)
            & (F.col("_rus") <= F.col("_pus"))
        )
        .groupBy(probe_id)
        .agg(F.count("*").alias("n_in_window"))
    )
    return (
        p.select(probe_id, key, ts)
        .join(hits, probe_id, "left")
        .na.fill({"n_in_window": 0})
    )
