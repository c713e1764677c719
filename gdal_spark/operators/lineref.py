"""Linear referencing (apps/ogrlineref.cpp: -get_pos locates a point's
measure along a reference polyline, -get_coord returns the coordinate
at a measure).

Both kernels are Arrow-batched and vectorized (points x segments
matrices); the polyline is a dim object by contract (ogrlineref holds
the whole reference line in memory).  Every float op mirrors the SQL
oracle's text order, so outputs are bit-identical doubles:

  * projection: t = clamp(((px-ax)*dx + (py-ay)*dy) / len2, 0, 1),
    foot = (ax + t*dx, ay + t*dy), d2 = (px-qx)^2 + (py-qy)^2;
  * nearest segment by (d2, segment index) — deterministic tie-break
    (ogrlineref's scan keeps the first best segment);
  * measure = cum_length_before + t * sqrt(len2).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

_POS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("measure", DoubleType()),
        StructField("dist2", DoubleType()),
    ]
)


def locate_along_line(
    points: DataFrame, line: list[tuple[float, float]], id_col: str = "doc_id"
) -> DataFrame:
    """ogrlineref -get_pos: per point, the measure (distance along the
    line) of its closest projection onto the polyline, plus the squared
    offset distance."""
    v = np.asarray(line, dtype=np.float64)
    ax, ay = v[:-1, 0], v[:-1, 1]
    dx, dy = v[1:, 0] - ax, v[1:, 1] - ay
    len2 = dx * dx + dy * dy
    seglen = np.sqrt(len2)
    cum0 = np.concatenate(([0.0], np.cumsum(seglen)))[:-1]

    def kernel(it):
        for pdf in it:
            px = pdf["lon"].to_numpy(np.float64)[:, None]
            py = pdf["lat"].to_numpy(np.float64)[:, None]
            t = ((px - ax) * dx + (py - ay) * dy) / len2
            t = np.minimum(np.maximum(t, 0.0), 1.0)
            qx = ax + t * dx
            qy = ay + t * dy
            d2 = (px - qx) * (px - qx) + (py - qy) * (py - qy)
            j = np.argmin(d2, axis=1)  # ties -> first (lowest) segment
            rows = np.arange(len(j))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "measure": cum0[j] + t[rows, j] * seglen[j],
                    "dist2": d2[rows, j],
                }
            )

    return points.select(id_col, "lon", "lat").mapInPandas(kernel, _POS_SCHEMA)


_COORD_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("x", DoubleType()),
        StructField("y", DoubleType()),
    ]
)


def point_at_measure(
    measures: DataFrame, line: list[tuple[float, float]], id_col: str = "doc_id"
) -> DataFrame:
    """ogrlineref -get_coord: coordinate at measure m along the line —
    segment = largest k with cum_start(k) <= m (measures beyond the end
    clamp to the last point)."""
    v = np.asarray(line, dtype=np.float64)
    ax, ay = v[:-1, 0], v[:-1, 1]
    dx, dy = v[1:, 0] - ax, v[1:, 1] - ay
    seglen = np.sqrt(dx * dx + dy * dy)
    cum0 = np.concatenate(([0.0], np.cumsum(seglen)))[:-1]

    def kernel(it):
        for pdf in it:
            m = pdf["m"].to_numpy(np.float64)
            j = np.clip(
                np.searchsorted(cum0, m, side="right") - 1, 0, len(cum0) - 1
            )
            t = np.minimum(np.maximum((m - cum0[j]) / seglen[j], 0.0), 1.0)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "x": ax[j] + t * dx[j],
                    "y": ay[j] + t * dy[j],
                }
            )

    return measures.select(id_col, "m").mapInPandas(kernel, _COORD_SCHEMA)
