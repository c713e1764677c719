"""Envelope (bbox) extraction — analog of OGRWKBGetBoundingBox
(ogr/ogr_wkb.cpp:574) and OGRGeometry::getEnvelope.

The envelope is the engine's first-stage filter everywhere, mirroring the
reference's bbox short-circuits (ogr/ogrgeometry.cpp:586-593 bbox reject;
ogr/ogrsf_frmts/generic/ogrlayer.cpp:2276-2303 rect-filter accept).
"""

from __future__ import annotations

import numpy as np

from gdal_spark.geometry.wkt import parse_wkt

__all__ = ["wkt_envelope", "envelopes_intersect"]


def wkt_envelope(wkt: str) -> tuple[float, float, float, float]:
    """(xmin, ymin, xmax, ymax) of any supported WKT geometry."""
    typ, payload = parse_wkt(wkt)
    if typ == "MULTIPOLYGON":
        arrays = [ring for poly in payload for ring in poly]
    else:
        arrays = payload
    if not arrays:
        return (np.nan, np.nan, np.nan, np.nan)
    allc = np.vstack(arrays)
    return (
        float(allc[:, 0].min()),
        float(allc[:, 1].min()),
        float(allc[:, 0].max()),
        float(allc[:, 1].max()),
    )


def envelopes_intersect(a, b) -> bool:
    """bbox overlap test (inclusive), the reject step of Intersects
    (ogrgeometry.cpp:586-593)."""
    return not (a[2] < b[0] or b[2] < a[0] or a[3] < b[1] or b[3] < a[1])
