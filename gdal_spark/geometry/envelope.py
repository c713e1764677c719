"""Envelope (bbox) extraction — analog of OGRWKBGetBoundingBox
(ogr/ogr_wkb.cpp:574) and OGRGeometry::getEnvelope.

The envelope is the engine's first-stage filter everywhere, mirroring the
reference's bbox short-circuits (ogr/ogrgeometry.cpp:586-593 bbox reject;
ogr/ogrsf_frmts/generic/ogrlayer.cpp:2276-2303 rect-filter accept).
"""

from __future__ import annotations

import numpy as np

from gdal_spark.geometry.wkt import parse_wkt

__all__ = ["wkt_envelope", "envelopes_intersect", "wkt_is_rectangle"]


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


def wkt_is_rectangle(wkt: str) -> bool:
    """``OGRGeometry::IsRectangle`` (ogr/ogrgeometry.cpp:8822-8860):
    single-ring POLYGON, 4 or 5 points (5th closing the ring), segments
    alternating axis-parallel starting in either the x or y direction.

    The spatial-filter machinery uses this to install the envelope-only
    fast path (``InstallFilter`` sets ``m_bFilterIsEnvelope``,
    ogrlayer.cpp:2171; ``FilterGeometry`` then short-circuits the exact
    predicate, ogrlayer.cpp:2287-2299)."""
    typ, payload = parse_wkt(wkt)
    if typ != "POLYGON" or len(payload) != 1:
        return False
    ring = payload[0]
    n = ring.shape[0]
    if n > 5 or n < 4:
        return False
    if n == 5 and (ring[0, 0] != ring[4, 0] or ring[0, 1] != ring[4, 1]):
        return False
    x, y = ring[:, 0], ring[:, 1]
    # first segment in "y" direction
    if x[0] == x[1] and y[1] == y[2] and x[2] == x[3] and y[3] == y[0]:
        return True
    # first segment in "x" direction
    if y[0] == y[1] and x[1] == x[2] and y[2] == y[3] and x[3] == x[0]:
        return True
    return False
