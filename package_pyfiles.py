#!/usr/bin/env python
"""Build the --py-files artifact for spark-submit deployment.

Usage:
    python package_pyfiles.py [out.zip]
    spark-submit --py-files gdal_spark.zip your_job.py

The engine is pure Python + numpy/pandas (pyarrow ships with Spark
executors), so a single zip of the package is the whole deployment unit.
"""

from __future__ import annotations

import os
import sys
import zipfile


def build(out: str = "gdal_spark.zip") -> str:
    root = os.path.dirname(os.path.abspath(__file__))
    pkg = os.path.join(root, "gdal_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirnames, filenames in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for fn in sorted(filenames):
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    zf.write(full, os.path.relpath(full, root))
    return out


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "gdal_spark.zip"
    print(build(out))
