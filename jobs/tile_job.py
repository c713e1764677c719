#!/usr/bin/env python
"""Checkpointed tile-pyramid job — the spark-submit deployment shape.

    python package_pyfiles.py
    spark-submit --py-files gdal_spark.zip jobs/tile_job.py \
        --sf-dir /root/testdata/sf0.01 --out /tmp/tiles --zmax 8

One checkpoint unit per zoom level (gdal2tiles --resume analog): rerun
the same command after a crash and completed levels are skipped; change
the input and the lineage fingerprint invalidates them. `--metrics`
prints the per-unit metrics table.
"""

from __future__ import annotations

import argparse
import os
import sys

# local runs: python jobs/tile_job.py puts jobs/ on sys.path, not the
# repo root; under spark-submit the zip from --py-files provides it
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out", required=True)
    ap.add_argument("--zmax", type=int, default=8)
    ap.add_argument("--replicate", type=int, default=1)
    ap.add_argument("--metrics", action="store_true")
    ap.add_argument(
        "--encode-mvt",
        action="store_true",
        help="add a final unit encoding the max-zoom tiles as MVT "
        "point tiles (operators/mvt.py) — the pipeline ends in real "
        "tile bytes, resume-safe like every other unit",
    )
    args = ap.parse_args()

    from gdal_spark import corpus
    from gdal_spark.checkpointing import CheckpointedJob
    from gdal_spark.operators.tiling import tile_counts
    from gdal_spark.session import get_spark

    spark = get_spark(app_name="tile-pyramid")
    docs = corpus.load_docs(spark, args.sf_dir, replicate=args.replicate).select(
        "lon", "lat"
    )
    job = CheckpointedJob(
        spark,
        args.out,
        lineage={"sf_dir": args.sf_dir, "zmax": args.zmax, "replicate": args.replicate},
    )
    units = {
        f"zoom={z}": (lambda z=z: tile_counts(docs, z)) for z in range(args.zmax + 1)
    }
    if args.encode_mvt:
        from gdal_spark.operators.mvt import encode_mvt_tiles

        def encode_unit():
            z = args.zmax
            scale = (1 << z) * 4096
            d = corpus.load_docs(
                spark, args.sf_dir, replicate=args.replicate
            )
            pts = d.selectExpr(
                "doc_id AS fid",
                # web-mercator global pixel coords at zmax, XYZ rows
                f"CAST(floor((lon + 1.8e2) / 3.6e2 * {scale}) AS BIGINT)"
                " AS _gx",
                "greatest(least(lat, 8.5e1), -8.5e1) AS _clat",
            ).selectExpr(
                "fid",
                f"CAST(floor((5.0e-1 - ln((1.0e0 + sin(_clat * pi()"
                f" / 1.8e2)) / (1.0e0 - sin(_clat * pi() / 1.8e2)))"
                f" / (4.0e0 * pi())) * {scale}) AS BIGINT) AS _gy",
                "_gx",
            ).selectExpr(
                "fid",
                "CAST((_gx - _gx % 4096) / 4096 AS BIGINT) AS tx",
                "CAST((_gy - _gy % 4096) / 4096 AS BIGINT) AS ty",
                "_gx % 4096 AS px",
                "_gy % 4096 AS py",
            )
            return encode_mvt_tiles(pts)

        units["encode_mvt"] = encode_unit
    ran = job.run(units)
    done = sum(1 for v in ran.values() if v)
    skipped = len(ran) - done
    print(f"tile_job: {done} units ran, {skipped} resumed (skipped)")
    if args.metrics:
        job.metrics().show(100, truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
