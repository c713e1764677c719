"""End-to-end spark-submit deployment (the north rule's `spark-submit
--py-files` shape): package the engine, run the checkpointed tile job in
a FRESH spark-submit process (the zip is the only code source), then run
it again and assert idempotent resume (every unit skipped)."""

import os
import re
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _submit(zip_path: str, out_dir: str, master: str = "local[4]") -> str:
    r = subprocess.run(
        [
            "spark-submit",
            "--master",
            master,
            "--py-files",
            zip_path,
            os.path.join(REPO, "jobs", "tile_job.py"),
            "--sf-dir",
            "/root/testdata/sf0.001",
            "--out",
            out_dir,
            "--zmax",
            "3",
        ],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=tempfile.gettempdir(),  # neutral cwd: the zip must suffice
    )
    assert r.returncode == 0, r.stderr[-3000:]
    m = re.search(r"tile_job: (\d+) units ran, (\d+) resumed", r.stdout)
    assert m, r.stdout[-2000:]
    return m.group(1), m.group(2)


def test_spark_submit_pyfiles_and_resume():
    zip_path = os.path.join(tempfile.gettempdir(), "gdal_spark_test.zip")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "package_pyfiles.py"), zip_path],
        check=True,
        cwd=REPO,
    )
    with tempfile.TemporaryDirectory() as out:
        ran, skipped = _submit(zip_path, out)
        assert (ran, skipped) == ("4", "0")  # zoom 0..3 all computed
        # second submission: identical lineage -> everything resumes
        ran2, skipped2 = _submit(zip_path, out)
        assert (ran2, skipped2) == ("0", "4")
        zooms = sorted(
            d for d in os.listdir(out) if d.startswith("zoom=")
        )
        assert zooms == ["zoom=0", "zoom=1", "zoom=2", "zoom=3"]


def test_spark_submit_two_cluster_sizes():
    """North-rule shape: the SAME spark-submit job at N and 4N
    parallelism (local[2] vs local[8]) produces bit-identical tiles —
    results are independent of cluster size."""
    import duckdb

    zip_path = os.path.join(tempfile.gettempdir(), "gdal_spark_test2.zip")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "package_pyfiles.py"), zip_path],
        check=True,
        cwd=REPO,
    )
    with tempfile.TemporaryDirectory() as out2, tempfile.TemporaryDirectory() as out8:
        assert _submit(zip_path, out2, master="local[2]") == ("4", "0")
        assert _submit(zip_path, out8, master="local[8]") == ("4", "0")
        con = duckdb.connect()
        diff = con.execute(
            f"""
            SELECT count(*) FROM (
              SELECT * FROM read_parquet('{out2}/zoom=*/data/*.parquet')
              EXCEPT
              SELECT * FROM read_parquet('{out8}/zoom=*/data/*.parquet')
            )
            """
        ).fetchone()[0]
        n2 = con.execute(
            f"SELECT count(*) FROM read_parquet('{out2}/zoom=*/data/*.parquet')"
        ).fetchone()[0]
        n8 = con.execute(
            f"SELECT count(*) FROM read_parquet('{out8}/zoom=*/data/*.parquet')"
        ).fetchone()[0]
        assert n2 == n8 and n2 > 0 and diff == 0
