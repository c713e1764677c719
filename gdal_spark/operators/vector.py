"""Small vector utilities (the gdal vector pipeline steps that are pure
per-feature geometry rewrites).

``explode_collections`` — ogr2ogr -explodecollections /
apps/gdalalg_vector_explode_collections.cpp: one output feature per
collection part; non-collections pass through as part 0.  Geometry is
re-serialized through the engine's canonical WKT writer
(geometry/wkt.py payload_to_wkt).

``swap_xy`` — ogr2ogr's axis swap (gdalalg_vector_swap_xy.cpp /
OGRGeometry::swapXY): every coordinate pair flips.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from gdal_spark.geometry.wkt import parse_wkt, payload_to_wkt

_EXPLODE_SCHEMA = StructType(
    [
        StructField("zone_id", LongType()),
        StructField("part", IntegerType()),
        StructField("geom_wkt", StringType()),
    ]
)


def explode_collections(
    zones: DataFrame, wkt_col: str = "geom_wkt", zone_id_col: str = "zone_id"
) -> DataFrame:
    """One row per collection member (any container type: MULTIPOLYGON /
    MULTIPOINT / MULTILINESTRING / GEOMETRYCOLLECTION, one level, via the
    shared container kernel); non-collections pass through as part 0.
    Arrow-batched; parse + re-serialize once per input feature."""
    import pandas as pd

    from gdal_spark.functions.collections import _explode_parts

    def kernel(it):
        for pdf in it:
            zid, part, out = [], [], []
            for z, w in zip(pdf[zone_id_col], pdf[wkt_col]):
                for i, member in enumerate(_explode_parts(w)):
                    zid.append(z)
                    part.append(i)
                    out.append(member)
            yield pd.DataFrame({"zone_id": zid, "part": part, "geom_wkt": out})

    return zones.select(zone_id_col, wkt_col).mapInPandas(
        kernel, _EXPLODE_SCHEMA
    )


_SWAP_SCHEMA = StructType(
    [
        StructField("zone_id", LongType()),
        StructField("geom_wkt", StringType()),
    ]
)


def swap_xy(
    zones: DataFrame, wkt_col: str = "geom_wkt", zone_id_col: str = "zone_id"
) -> DataFrame:
    """OGRGeometry::swapXY: flip every (x, y) pair, canonical WKT out
    (all types incl. nested collections, via the shared swap kernel)."""
    import pandas as pd

    from gdal_spark.functions.collections import _swap_xy

    def kernel(it):
        for pdf in it:
            out = [_swap_xy(w) for w in pdf[wkt_col]]
            yield pd.DataFrame({"zone_id": pdf[zone_id_col], "geom_wkt": out})

    return zones.select(zone_id_col, wkt_col).mapInPandas(kernel, _SWAP_SCHEMA)


def _clip_halfplane(ring, keep_left: bool, x0: float = 180.0):
    """Sutherland-Hodgman against the vertical line x = x0 (one clip
    edge; S-H is exact for ANY simple subject against a halfplane).
    ``ring`` is open (no closing duplicate)."""
    import numpy as np

    def inside(p):
        return p[0] <= x0 if keep_left else p[0] >= x0

    out = []
    n = len(ring)
    for i in range(n):
        s, e = ring[i], ring[(i + 1) % n]
        if inside(e):
            if not inside(s):
                t = (x0 - s[0]) / (e[0] - s[0])
                out.append((x0, s[1] + t * (e[1] - s[1])))
            out.append((e[0], e[1]))
        elif inside(s):
            t = (x0 - s[0]) / (e[0] - s[0])
            out.append((x0, s[1] + t * (e[1] - s[1])))
    return np.asarray(out, dtype=np.float64)


def wrap_dateline(
    zones: DataFrame, wkt_col: str = "geom_wkt", zone_id_col: str = "zone_id"
) -> DataFrame:
    """ogr2ogr -wrapdateline (ogr/ogrgeometryfactory.cpp
    transformWithOptions WRAPDATELINE path) for polygons given in a
    0..360-extended frame: geometry entirely west of lon 180 passes
    through untouched (part 0); entirely east shifts -360; a crossing
    polygon splits at lon 180 into the in-range piece (part 0) and the
    shifted piece (part 1).

    v1 contract: simple polygons (no holes crossing the line); the
    reference's multi-geometry + hole re-association is out of scope
    (documented).  Map-side Arrow kernel, per-unique-geometry work."""
    import numpy as np
    import pandas as pd

    def kernel(it):
        for pdf in it:
            zid, part, out = [], [], []
            for z, w in zip(pdf[zone_id_col], pdf[wkt_col]):
                typ, payload = parse_wkt(w)
                ring = np.asarray(payload[0], dtype=np.float64)
                open_ring = ring[:-1] if (ring[0] == ring[-1]).all() else ring
                xs = open_ring[:, 0]
                pieces = []
                if xs.max() <= 180.0:
                    pieces.append(open_ring)
                elif xs.min() >= 180.0:
                    pieces.append(open_ring - [360.0, 0.0])
                else:
                    pieces.append(_clip_halfplane(open_ring, keep_left=True))
                    pieces.append(
                        _clip_halfplane(open_ring, keep_left=False)
                        - [360.0, 0.0]
                    )
                for i, p in enumerate(pieces):
                    closed = np.vstack([p, p[:1]])
                    zid.append(z)
                    part.append(i)
                    out.append(payload_to_wkt("POLYGON", [closed]))
            yield pd.DataFrame({"zone_id": zid, "part": part, "geom_wkt": out})

    return zones.select(zone_id_col, wkt_col).mapInPandas(
        kernel, _EXPLODE_SCHEMA
    )
