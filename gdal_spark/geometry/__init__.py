"""Pure-numpy geometry kernels (no Spark imports here).

Everything in this package is a from-scratch port of *semantics* from the
GDAL reference (file:line citations in each module); the implementations
are vectorized numpy, structured for Arrow-batched pandas UDFs.
"""

from gdal_spark.geometry.wkt import parse_wkt, point_wkt, polygon_wkt  # noqa: F401
from gdal_spark.geometry.envelope import wkt_envelope  # noqa: F401
from gdal_spark.geometry.pip import (  # noqa: F401
    points_in_polygon,
    points_in_polygon_wkt,
    points_in_ring,
)
from gdal_spark.geometry import mercator  # noqa: F401
