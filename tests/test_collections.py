"""Geometry-collection codec + accessor kernels
(geometry/wkt.py MULTI*/GEOMETRYCOLLECTION, functions/collections.py) —
pure-python known answers against the OGR container semantics
(ogr_api.h OGR_G_GetGeometryCount/GetGeometryRef,
ogrgeometryfactory.cpp forceToMulti*)."""

from gdal_spark.functions.collections import (
    _explode_parts,
    _force_multi,
    _geometry_n,
    _num_geometries,
    _swap_xy,
)
from gdal_spark.geometry.wkt import parse_wkt, payload_to_wkt


def _roundtrip(wkt: str) -> str:
    return payload_to_wkt(*parse_wkt(wkt))


class TestCodec:
    def test_multipoint_both_spellings(self):
        # ISO inner-paren and legacy bare spellings parse identically;
        # the canonical emit is the reference's legacy spelling
        assert _roundtrip("MULTIPOINT ((1 2),(3 4))") == "MULTIPOINT (1 2,3 4)"
        assert _roundtrip("MULTIPOINT (1 2,3 4)") == "MULTIPOINT (1 2,3 4)"

    def test_multilinestring(self):
        w = "MULTILINESTRING ((0 0,1 1),(2 2,3 3,4 4))"
        assert _roundtrip(w) == w

    def test_geometrycollection_nested(self):
        w = ("GEOMETRYCOLLECTION (POINT (1 2),MULTIPOINT (3 4,5 6),"
             "GEOMETRYCOLLECTION (LINESTRING (0 0,1 1)))")
        assert _roundtrip(w) == w

    def test_linearring(self):
        w = "LINEARRING (0 0,1 0,1 1,0 0)"
        assert _roundtrip(w) == w

    def test_empty(self):
        assert _roundtrip("GEOMETRYCOLLECTION EMPTY") == (
            "GEOMETRYCOLLECTION EMPTY"
        )
        assert _roundtrip("MULTIPOINT EMPTY") == "MULTIPOINT EMPTY"

    def test_tin_and_polyhedralsurface(self):
        tin = "TIN (((0 0,1 0,0 1,0 0)),((1 0,1 1,0 1,1 0)))"
        assert _roundtrip(tin) == tin
        phs = "POLYHEDRALSURFACE (((0 0,4 0,4 4,0 4,0 0)))"
        assert _roundtrip(phs) == phs


class TestAccessors:
    HOLED = "POLYGON ((0 0,9 0,9 9,0 9,0 0),(2 2,3 2,3 3,2 3,2 2))"

    def test_count_matches_ogr_semantics(self):
        # OGR_G_GetGeometryCount: point/line -> 0, polygon -> rings,
        # containers -> members
        assert _num_geometries("POINT (1 2)") == 0
        assert _num_geometries("LINESTRING (0 0,1 1)") == 0
        assert _num_geometries(self.HOLED) == 2
        assert _num_geometries("MULTIPOINT (1 2,3 4,5 6)") == 3
        assert _num_geometries(
            "MULTIPOLYGON (((0 0,1 0,1 1,0 0)),((2 2,3 2,3 3,2 2)))"
        ) == 2
        assert _num_geometries(
            "GEOMETRYCOLLECTION (POINT (1 2),LINESTRING (0 0,1 1))"
        ) == 2
        assert _num_geometries("GEOMETRYCOLLECTION EMPTY") == 0

    def test_geometry_n(self):
        assert _geometry_n("MULTIPOINT (1 2,3 4)", 1) == "POINT (3 4)"
        assert _geometry_n("MULTIPOINT (1 2,3 4)", 2) is None
        assert _geometry_n("MULTIPOINT (1 2,3 4)", -1) is None
        assert (
            _geometry_n("MULTILINESTRING ((0 0,1 1),(2 2,3 3))", 0)
            == "LINESTRING (0 0,1 1)"
        )
        assert (
            _geometry_n(
                "MULTIPOLYGON (((0 0,1 0,1 1,0 0)),((2 2,3 2,3 3,2 2)))", 1
            )
            == "POLYGON ((2 2,3 2,3 3,2 2))"
        )
        assert (
            _geometry_n("GEOMETRYCOLLECTION (POINT (1 2),MULTIPOINT (3 4))", 1)
            == "MULTIPOINT (3 4)"
        )
        # polygon ring comes back as the reference's LINEARRING spelling
        assert (
            _geometry_n(self.HOLED, 1) == "LINEARRING (2 2,3 2,3 3,2 3,2 2)"
        )
        assert _geometry_n("POINT (1 2)", 0) is None

    def test_force_multi(self):
        assert _force_multi("POINT (1 2)") == "MULTIPOINT (1 2)"
        assert (
            _force_multi("LINESTRING (0 0,1 1)")
            == "MULTILINESTRING ((0 0,1 1))"
        )
        assert (
            _force_multi("POLYGON ((0 0,1 0,1 1,0 0))")
            == "MULTIPOLYGON (((0 0,1 0,1 1,0 0)))"
        )
        # already-multi passes through canonically
        assert (
            _force_multi("MULTIPOINT ((1 2),(3 4))") == "MULTIPOINT (1 2,3 4)"
        )

    def test_surface_patches(self):
        # TIN/POLYHEDRALSURFACE count + hand back POLYGON patches
        # (ogrpolyhedralsurface.cpp) but are SURFACES: explode leaves
        # them whole (they are not GeometryCollection subclasses)
        tin = "TIN (((0 0,1 0,0 1,0 0)),((1 0,1 1,0 1,1 0)))"
        assert _num_geometries(tin) == 2
        assert _geometry_n(tin, 1) == "POLYGON ((1 0,1 1,0 1,1 0))"
        assert _explode_parts(tin) == [tin]

    def test_explode_parts(self):
        # one level of -explodecollections; non-containers pass through
        assert _explode_parts("MULTIPOINT (1 2,3 4)") == [
            "POINT (1 2)",
            "POINT (3 4)",
        ]
        assert _explode_parts(
            "GEOMETRYCOLLECTION (POINT (1 2),MULTIPOINT (3 4,5 6))"
        ) == ["POINT (1 2)", "MULTIPOINT (3 4,5 6)"]
        assert _explode_parts("POINT (1 2)") == ["POINT (1 2)"]
        assert _explode_parts(
            "MULTIPOLYGON (((0 0,1 0,1 1,0 0)),((2 2,3 2,3 3,2 2)))"
        ) == ["POLYGON ((0 0,1 0,1 1,0 0))", "POLYGON ((2 2,3 2,3 3,2 2))"]

    def test_swap_xy(self):
        assert _swap_xy("POINT (1 2)") == "POINT (2 1)"
        assert (
            _swap_xy("POLYGON ((0 0,4 0,4 2,0 0))")
            == "POLYGON ((0 0,0 4,2 4,0 0))"
        )
        assert (
            _swap_xy("GEOMETRYCOLLECTION (POINT (1 2),LINESTRING (3 4,5 6))")
            == "GEOMETRYCOLLECTION (POINT (2 1),LINESTRING (4 3,6 5))"
        )
        assert (
            _swap_xy("MULTIPOLYGON (((0 0,1 0,1 2,0 0)))")
            == "MULTIPOLYGON (((0 0,0 1,2 1,0 0)))"
        )
