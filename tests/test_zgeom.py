"""Z (2.5-D) + measured (M/ZM) codec and function kernels
(geometry/wkt.py parse_wkt_z/parse_wkt_zm, functions/zgeom.py) —
pure-python known answers."""

import numpy as np
import pytest

from gdal_spark.functions.zgeom import (
    _drop_m,
    _force2d,
    _force3d,
    _is_measured,
    _length3d,
    _m_of,
    _z_of,
)
from gdal_spark.geometry.wkt import (
    parse_wkt,
    parse_wkt_z,
    parse_wkt_zm,
    payload_to_wkt_z,
    payload_to_wkt_zm,
)


class TestCodec:
    def test_point_z_roundtrip(self):
        typ, payload, has_z = parse_wkt_z("POINT Z (3 4 5)")
        assert (typ, has_z) == ("POINT", True)
        assert payload[0].tolist() == [[3.0, 4.0, 5.0]]
        assert payload_to_wkt_z(typ, payload, has_z) == "POINT Z (3 4 5)"

    def test_bare_three_coordinate_vertices(self):
        # the reference accepts untagged 3-coordinate vertices
        typ, payload, has_z = parse_wkt_z("LINESTRING (0 0 0,1 1 1)")
        assert has_z and typ == "LINESTRING"

    def test_polygon_z(self):
        typ, payload, has_z = parse_wkt_z(
            "POLYGON Z ((0 0 1,4 0 1,4 4 1,0 0 1))"
        )
        assert has_z and payload[0].shape == (4, 3)
        assert (
            payload_to_wkt_z(typ, payload, has_z)
            == "POLYGON Z ((0 0 1,4 0 1,4 4 1,0 0 1))"
        )

    def test_planar_parser_stays_2d(self):
        typ, payload = parse_wkt("POLYGON ((0 0,4 0,4 4,0 0))")
        assert payload[0].shape == (4, 2)

    def test_2d_input_z_defaults_zero(self):
        _, payload, has_z = parse_wkt_z("POINT (3 4)")
        assert not has_z and payload[0].tolist() == [[3.0, 4.0, 0.0]]


class TestKernels:
    def test_z_accessor(self):
        assert _z_of("POINT Z (3 4 5)") == 5.0
        assert _z_of("POINT (3 4)") is None  # 2-D -> NULL (getZ contract)
        assert _z_of("LINESTRING Z (0 0 0,1 1 1)") is None  # points only

    def test_force2d_flattens(self):
        assert _force2d("POINT Z (3 4 5)") == "POINT (3 4)"
        assert (
            _force2d("POLYGON Z ((0 0 1,4 0 1,4 4 1,0 0 1))")
            == "POLYGON ((0 0,4 0,4 4,0 0))"
        )

    def test_force3d_sets_missing_keeps_existing(self):
        assert _force3d("POINT (3 4)", 9.0) == "POINT Z (3 4 9)"
        assert _force3d("POINT Z (3 4 5)", 9.0) == "POINT Z (3 4 5)"

    def test_length3d_pythagorean(self):
        assert _length3d("LINESTRING Z (0 0 0,3 4 12)") == 13.0
        # 2-D linestring: z defaults 0 -> planar length
        assert _length3d("LINESTRING (0 0,3 4)") == 5.0
        assert _length3d("POINT Z (1 2 3)") is None


class TestMCodec:
    """Dimension-preamble rules per importPreambleFromWkt
    (ogr/ogrgeometry.cpp:1808): M -> 3rd coord is measure, ZM -> x y z m,
    untagged 4-coordinate vertices promote to ZM."""

    def test_point_m_roundtrip(self):
        typ, payload, has_z, has_m = parse_wkt_zm("POINT M (3 4 7)")
        assert (typ, has_z, has_m) == ("POINT", False, True)
        assert payload[0].tolist() == [[3.0, 4.0, 0.0, 7.0]]
        assert (
            payload_to_wkt_zm(typ, payload, has_z, has_m)
            == "POINT M (3 4 7)"
        )

    def test_point_zm_roundtrip(self):
        typ, payload, has_z, has_m = parse_wkt_zm("POINT ZM (3 4 5 7)")
        assert (has_z, has_m) == (True, True)
        assert payload[0].tolist() == [[3.0, 4.0, 5.0, 7.0]]
        assert (
            payload_to_wkt_zm(typ, payload, has_z, has_m)
            == "POINT ZM (3 4 5 7)"
        )

    def test_untagged_promotion(self):
        # 3 coords -> z (legacy 2.5-D), 4 coords -> z+m
        _, p3, z3, m3 = parse_wkt_zm("POINT (3 4 5)")
        assert (z3, m3) == (True, False)
        _, p4, z4, m4 = parse_wkt_zm("LINESTRING (0 0 1 2,1 1 3 4)")
        assert (z4, m4) == (True, True)
        assert p4[0].tolist() == [[0, 0, 1, 2], [1, 1, 3, 4]]

    def test_z_tag_does_not_set_m(self):
        _, payload, has_z, has_m = parse_wkt_zm("POINT Z (3 4 5)")
        assert (has_z, has_m) == (True, False)
        assert payload[0].tolist() == [[3.0, 4.0, 5.0, 0.0]]

    def test_polygon_zm(self):
        wkt = "POLYGON ZM ((0 0 1 2,4 0 1 2,4 4 1 2,0 0 1 2))"
        typ, payload, has_z, has_m = parse_wkt_zm(wkt)
        assert (has_z, has_m) == (True, True)
        assert payload[0].shape == (4, 4)
        assert payload_to_wkt_zm(typ, payload, has_z, has_m) == wkt

    def test_empty_preamble(self):
        typ, payload, has_z, has_m = parse_wkt_zm("POINT ZM EMPTY")
        assert (typ, has_z, has_m) == ("POINT", True, True)
        assert payload_to_wkt_zm(typ, payload, has_z, has_m) == "POINT ZM EMPTY"


class TestMKernels:
    def test_m_accessor(self):
        assert _m_of("POINT M (3 4 7)") == 7.0
        assert _m_of("POINT ZM (3 4 5 7)") == 7.0
        assert _m_of("POINT (3 4)") is None  # 2-D -> NULL (getM contract)
        assert _m_of("POINT Z (3 4 5)") is None  # Z-only -> NULL

    def test_is_measured(self):
        assert _is_measured("POINT M (3 4 7)")
        assert _is_measured("POINT ZM (3 4 5 7)")
        assert not _is_measured("POINT Z (3 4 5)")
        assert not _is_measured("POINT (3 4)")

    def test_drop_m_keeps_z(self):
        # setMeasured(FALSE): strip M, keep Z
        assert _drop_m("POINT ZM (3 4 5 7)") == "POINT Z (3 4 5)"
        assert _drop_m("POINT M (3 4 7)") == "POINT (3 4)"
        assert _drop_m("POINT Z (3 4 5)") == "POINT Z (3 4 5)"
