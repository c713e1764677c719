"""Snapshot-incremental rollup through CheckpointedJob: snapshot-1
state is computed once and persisted; the snapshot-2 job resumes (unit
skipped), aggregates only the delta rows, and merges partial states —
bit-equal to a full recompute."""

import pyspark.sql.functions as F

from gdal_spark.checkpointing import CheckpointedJob
from gdal_spark.registry import _SNAP_T1_US, _SNAP_T2_US, _snap_state


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_snapshot_incremental_resume(spark, sf_dir, tmp_path):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    us = F.expr("unix_micros(CAST(ts AS TIMESTAMP))")

    job = CheckpointedJob(spark, str(tmp_path), lineage={"snapshot": 1})
    ran = job.run_unit("state_s1", lambda: _snap_state(ev.filter(us < _SNAP_T1_US)))
    assert ran  # first run computes

    # second invocation resumes idempotently: unit already committed
    ran_again = job.run_unit(
        "state_s1", lambda: _snap_state(ev.filter(us < _SNAP_T1_US))
    )
    assert not ran_again

    delta = _snap_state(
        ev.filter((us >= _SNAP_T1_US) & (us < _SNAP_T2_US))
    )
    merged = (
        job.read_unit("state_s1")
        .unionByName(delta)
        .groupBy("user_id")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_value_c").alias("sum_value_c"),
        )
    )
    full = _snap_state(ev.filter(us < _SNAP_T2_US))
    assert _rows(merged) == _rows(full)

    # metrics table carries the persisted unit's lineage + row count
    m = {r["unit"]: r for r in job.metrics().collect()}
    assert "state_s1" in m and m["state_s1"]["rows"] > 0
