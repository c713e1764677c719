"""Idempotent checkpoint/resume with per-unit lineage + metrics.

Mirrors the reference's resume semantics: gdal2tiles ``--resume`` skips
tiles that already exist (gdal2tiles.py:1497-1500), making the tiling
job restartable at tile granularity.  Here the unit of restart is a
named slice of the job (a zoom level, a cell-range, a table partition);
each completed unit commits:

  * its output as parquet under ``<root>/<unit>/data`` (written with a
    temp-dir rename so a unit is either fully committed or absent);
  * a ``manifest.json`` with row count, wall seconds, and a lineage
    fingerprint (input path + parameters), so a resume with CHANGED
    inputs invalidates instead of silently skipping.

``metrics()`` exposes all manifests as a DataFrame — the per-partition
metrics table the north rule asks for.  On a real cluster this maps to
one Iceberg snapshot commit per unit; parquet-dir-plus-manifest is the
same protocol without the catalog.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


class CheckpointedJob:
    def __init__(self, spark: SparkSession, root: str, lineage: dict | None = None):
        self.spark = spark
        self.root = root
        self.lineage = lineage or {}
        os.makedirs(root, exist_ok=True)

    def _unit_dir(self, unit: str) -> str:
        return os.path.join(self.root, unit)

    def _manifest_path(self, unit: str) -> str:
        return os.path.join(self._unit_dir(unit), "manifest.json")

    def is_done(self, unit: str) -> bool:
        path = self._manifest_path(unit)
        if not os.path.exists(path):
            return False
        with open(path) as f:
            m = json.load(f)
        return m.get("lineage") == self.lineage  # changed inputs invalidate

    def run_unit(self, unit: str, fn: Callable[[], DataFrame]) -> bool:
        """Execute one unit unless already committed. Returns True if the
        unit ran, False if it was skipped (resume)."""
        if self.is_done(unit):
            return False
        udir = self._unit_dir(unit)
        tmp = udir + ".inprogress"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        os.makedirs(tmp)
        t0 = time.monotonic()
        df = fn()
        df.write.mode("overwrite").parquet(os.path.join(tmp, "data"))
        rows = self.spark.read.parquet(os.path.join(tmp, "data")).count()
        manifest = {
            "unit": unit,
            "rows": rows,
            "seconds": round(time.monotonic() - t0, 3),
            "finished_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "lineage": self.lineage,
        }
        with open(os.path.join(tmp, "manifest.json"), "w") as f:
            json.dump(manifest, f)
        # the stale/invalidated unit survives until the new one is fully
        # built, so a crash mid-recompute never loses both copies
        if os.path.exists(udir):
            shutil.rmtree(udir)
        os.rename(tmp, udir)  # atomic commit
        return True

    def run(self, units: dict[str, Callable[[], DataFrame]]) -> dict[str, bool]:
        return {unit: self.run_unit(unit, fn) for unit, fn in units.items()}

    def read_unit(self, unit: str) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self._unit_dir(unit), "data"))

    def metrics(self) -> DataFrame:
        """All unit manifests as a DataFrame (unit, rows, seconds, ...)."""
        rows = []
        for unit in sorted(os.listdir(self.root)):
            if unit.endswith(".inprogress"):
                continue  # crashed-unit debris, not a committed unit
            path = self._manifest_path(unit)
            if os.path.exists(path):
                with open(path) as f:
                    m = json.load(f)
                rows.append(
                    (m["unit"], m["rows"], m["seconds"], m["finished_at"])
                )
        return self.spark.createDataFrame(
            rows, "unit string, rows long, seconds double, finished_at string"
        )
