"""Structured Streaming rollup == batch rollup (AvailableNow drain)."""

import shutil
import tempfile

from pyspark.sql import functions as F

from gdal_spark.streaming import run_available_now, stream_events_rollup


def test_stream_rollup_matches_batch(spark, sf_dir):
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    with tempfile.TemporaryDirectory() as d:
        # stage the events as a streamed-in directory (2 "arrivals")
        half = batch.count() // 2
        batch.limit(half).write.mode("overwrite").parquet(f"{d}/in")
        batch.subtract(batch.limit(half)).write.mode("append").parquet(f"{d}/in")
        out = stream_events_rollup(spark, f"{d}/in", batch.schema)
        run_available_now(out, "rollup_test")
        got = {
            (r.hour_ts, r.event_type): (r.n_events, r.sum_value)
            for r in spark.sql("SELECT * FROM rollup_test").collect()
        }
    want = {
        (r.hour_ts, r.event_type): (r.n_events, r.sum_value)
        for r in batch.groupBy(
            F.date_trunc("hour", "ts").alias("hour_ts"), "event_type"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .collect()
    }
    assert set(got) == set(want)
    # counts always agree; float sums may differ in the last ulp across
    # the two plans, so compare sums with a tolerance
    for k in want:
        assert got[k][0] == want[k][0], k
        assert abs(got[k][1] - want[k][1]) < 1e-6, k
