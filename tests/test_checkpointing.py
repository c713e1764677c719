"""Checkpoint/resume: idempotent unit commits, lineage invalidation,
metrics table — the gdal2tiles --resume analog."""

import tempfile

from pyspark.sql import functions as F

from gdal_spark.checkpointing import CheckpointedJob
from gdal_spark.operators.tiling import tile_counts


def _docs(spark):
    return spark.range(1000).select(
        (F.col("id") % 360 - 180.0 + 0.5).alias("lon"),
        (F.col("id") % 120 - 60.0 + 0.5).alias("lat"),
    )


def test_resume_skips_completed_units(spark):
    with tempfile.TemporaryDirectory() as root:
        job = CheckpointedJob(spark, root, lineage={"src": "range1000", "zmax": 3})
        units = {
            f"zoom={z}": (lambda z=z: tile_counts(_docs(spark), z)) for z in range(4)
        }
        ran = job.run(units)
        assert all(ran.values())

        # resume: nothing re-runs
        job2 = CheckpointedJob(spark, root, lineage={"src": "range1000", "zmax": 3})
        ran2 = job2.run(units)
        assert not any(ran2.values())

        # output readable and stable
        z2 = job2.read_unit("zoom=2")
        assert z2.count() > 0

        m = job2.metrics()
        assert m.count() == 4
        assert set(m.columns) == {"unit", "rows", "seconds", "finished_at"}


def test_changed_lineage_invalidates(spark):
    with tempfile.TemporaryDirectory() as root:
        job = CheckpointedJob(spark, root, lineage={"src": "a"})
        job.run_unit("zoom=0", lambda: tile_counts(_docs(spark), 0))
        # same lineage: skip
        assert job.run_unit("zoom=0", lambda: tile_counts(_docs(spark), 0)) is False
        # different input fingerprint: re-run
        job2 = CheckpointedJob(spark, root, lineage={"src": "b"})
        assert job2.run_unit("zoom=0", lambda: tile_counts(_docs(spark), 0)) is True


def test_partial_run_resumes_remaining(spark):
    with tempfile.TemporaryDirectory() as root:
        job = CheckpointedJob(spark, root, lineage={})
        job.run_unit("zoom=0", lambda: tile_counts(_docs(spark), 0))
        # simulate crash before zoom=1; a fresh job object resumes
        job2 = CheckpointedJob(spark, root, lineage={})
        ran = job2.run(
            {
                "zoom=0": lambda: tile_counts(_docs(spark), 0),
                "zoom=1": lambda: tile_counts(_docs(spark), 1),
            }
        )
        assert ran == {"zoom=0": False, "zoom=1": True}
