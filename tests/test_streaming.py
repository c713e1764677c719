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


def test_stream_dedup_stateful_across_batches(spark):
    """applyInPandasWithState dedup: a hash seen in batch 1 must NOT be
    re-emitted by batch 2 (state crosses micro-batches)."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from gdal_spark.streaming import stream_dedup

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    rows1 = [(i, f"text-{i % 10}") for i in range(0, 30)]  # 10 distinct
    rows2 = [(i, f"text-{i % 25}") for i in range(30, 80)]  # 15 new
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(rows1, schema).coalesce(1).write.parquet(f"{d}/in")
        spark.createDataFrame(rows2, schema).coalesce(1).write.mode("append").parquet(
            f"{d}/in"
        )
        out = stream_dedup(spark, f"{d}/in", schema)
        q = (
            out.writeStream.format("memory")
            .queryName("dedup_test")
            .outputMode("append")
            .option("checkpointLocation", f"{d}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = spark.sql("SELECT * FROM dedup_test").collect()
    # exactly one row per distinct text across the whole stream
    assert len(got) == 25
    assert len({r.h for r in got}) == 25
    # every emitted doc_id actually carries the text it represents
    texts = {}
    for i, t in rows1 + rows2:
        texts.setdefault(t, set()).add(i)
    import hashlib

    h2ids = {
        hashlib.md5(t.encode()).hexdigest(): ids for t, ids in texts.items()
    }
    for r in got:
        assert r.doc_id in h2ids[r.h]


def test_stream_pip_counts_match_batch(spark, sf_dir):
    """Stream-static PIP join drained with AvailableNow must equal the
    batch pip_join_agg zonal counts exactly."""
    from gdal_spark import corpus, zones
    from gdal_spark.operators.pip_join import pip_join
    from gdal_spark.streaming import run_available_now, stream_pip_counts

    z = zones.rect_zones(spark).drop("zxmin", "zymin", "zxmax", "zymax")
    with tempfile.TemporaryDirectory() as d:
        # the streaming file source tails a DIRECTORY of arrivals
        shutil.copy(f"{sf_dir}/documents.parquet", f"{d}/part-0.parquet")
        stream = stream_pip_counts(spark, d, z)
        run_available_now(stream, "pipcounts")
        got = {
            r.zone_id: r.n_docs
            for r in spark.sql("SELECT * FROM pipcounts").collect()
        }
    docs = corpus.load_docs(spark, sf_dir)
    want = {
        r.zone_id: r.n
        for r in pip_join(docs, z).groupBy("zone_id").agg(
            F.count("*").alias("n")
        ).collect()
    }
    assert got == want and len(want) > 0


def test_stream_sessionize_matches_batch(spark, sf_dir):
    """session_window streaming sessions == the batch gaps-and-islands
    sessionize (same gap, same per-row floored value sums)."""
    import tempfile

    from gdal_spark.registry import q_sessionize
    from gdal_spark.streaming import run_available_now, stream_sessionize

    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    with tempfile.TemporaryDirectory() as d:
        half = batch.count() // 2
        batch.limit(half).write.mode("overwrite").parquet(f"{d}/in")
        batch.subtract(batch.limit(half)).write.mode("append").parquet(f"{d}/in")
        out = stream_sessionize(spark, f"{d}/in", batch.schema)
        run_available_now(out, "sessionize_test")
        got = {
            (r.user_id, r.session_start, r.session_end): (r.n_events, r.value_4)
            for r in spark.sql("SELECT * FROM sessionize_test").collect()
        }
    want = {
        (r.user_id, r.session_start, r.session_end): (r.n_events, r.value_4)
        for r in q_sessionize(spark, sf_dir).collect()
    }
    assert got == want and len(want) > 0


def test_stream_neardup_matches_batch(spark, sf_dir):
    """Cross-batch MinHash near-dup candidates: the streaming
    per-bucket-state operator must find EXACTLY the batch pipeline's
    pair set (ids + signature agreement), regardless of which micro-
    batch each side of a pair arrived in."""
    from gdal_spark.operators.text import minhash_md5_pairs
    from gdal_spark.streaming import stream_neardup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    batch = {
        (r.id_a, r.id_b, r.n_equal) for r in minhash_md5_pairs(docs).collect()
    }
    assert batch, "fixture vacuous: batch pipeline found no pairs"
    with tempfile.TemporaryDirectory() as d:
        docs.filter("doc_id % 2 = 0").coalesce(1).write.parquet(f"{d}/in")
        docs.filter("doc_id % 2 = 1").coalesce(1).write.mode("append").parquet(
            f"{d}/in"
        )
        out = stream_neardup(spark, f"{d}/in", docs.schema)
        q = (
            out.writeStream.format("memory")
            .queryName("neardup_test")
            .outputMode("append")
            .option("checkpointLocation", f"{d}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = {
            (r.id_a, r.id_b, r.n_equal)
            for r in spark.sql(
                "SELECT DISTINCT id_a, id_b, n_equal FROM neardup_test"
            ).collect()
        }
    assert got == batch


def test_stream_tile_sink_exactly_once(spark):
    """Streaming TILE pipeline: an arriving point corpus encodes to MVT
    tiles per micro-batch and publishes through the snapshot table's
    exactly-once foreachBatch sink (one snapshot per batch, replays
    deduplicated) — gdal2tiles --resume (gdal2tiles.py:1497-1500)
    lifted to the streaming path."""
    import tempfile

    from pyspark.sql.types import LongType, StructField, StructType

    from gdal_spark.operators.mvt import encode_mvt_tiles, mvt_point_tile
    from gdal_spark.table import SnapshotTable

    schema = StructType(
        [
            StructField("fid", LongType()),
            StructField("tx", LongType()),
            StructField("ty", LongType()),
            StructField("px", LongType()),
            StructField("py", LongType()),
        ]
    )
    rows1 = [(i, 0, 0, i % 4096, (i * 7) % 4096) for i in range(50)]
    rows2 = [(i, 1, 0, i % 4096, (i * 3) % 4096) for i in range(50, 80)]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(rows1, schema).coalesce(1).write.parquet(
            f"{d}/in"
        )
        spark.createDataFrame(rows2, schema).coalesce(1).write.mode(
            "append"
        ).parquet(f"{d}/in")
        t = SnapshotTable(spark, f"{d}/tiles")

        def run():
            src = spark.readStream.schema(schema).parquet(f"{d}/in")

            def sink(batch_df, batch_id):
                t.append_batch(encode_mvt_tiles(batch_df), batch_id)

            q = (
                src.writeStream.foreachBatch(sink)
                .option("checkpointLocation", f"{d}/ckpt")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        run()
        n_snapshots = t.snapshots().count()
        tiles = {
            (r["tx"], r["ty"]): bytes(r["mvt"]) for r in t.read().collect()
        }
        # every arrived tile present, bytes exactly the local encoding
        assert set(tiles) == {(0, 0), (1, 0)}
        assert tiles[(0, 0)] == mvt_point_tile(
            [(i, i % 4096, (i * 7) % 4096) for i in range(50)]
        )
        # resume from the same checkpoint: nothing new arrives, no new
        # snapshot commits (exactly-once under replay)
        run()
        assert t.snapshots().count() == n_snapshots
        assert t.read().count() == 2
