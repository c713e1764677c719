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
    """One row per polygon part: MULTIPOLYGON (n parts) -> n POLYGON
    rows (part = collection index); POLYGON -> itself as part 0.
    Arrow-batched; parse + re-serialize once per input feature."""
    import pandas as pd

    def kernel(it):
        for pdf in it:
            zid, part, out = [], [], []
            for z, w in zip(pdf[zone_id_col], pdf[wkt_col]):
                typ, payload = parse_wkt(w)
                if typ == "MULTIPOLYGON":
                    for i, rings in enumerate(payload):
                        zid.append(z)
                        part.append(i)
                        out.append(payload_to_wkt("POLYGON", rings))
                else:
                    zid.append(z)
                    part.append(0)
                    out.append(payload_to_wkt(typ, payload))
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
    """OGRGeometry::swapXY: flip every (x, y) pair, canonical WKT out."""
    import pandas as pd

    def kernel(it):
        for pdf in it:
            zid, out = [], []
            for z, w in zip(pdf[zone_id_col], pdf[wkt_col]):
                typ, payload = parse_wkt(w)
                if typ == "MULTIPOLYGON":
                    swapped = [[r[:, ::-1] for r in rings] for rings in payload]
                else:  # POINT/LINESTRING/POLYGON: flat list of coord arrays
                    swapped = [r[:, ::-1] for r in payload]
                zid.append(z)
                out.append(payload_to_wkt(typ, swapped))
            yield pd.DataFrame({"zone_id": zid, "geom_wkt": out})

    return zones.select(zone_id_col, wkt_col).mapInPandas(kernel, _SWAP_SCHEMA)
