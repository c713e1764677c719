"""Z (2.5-D) codec + function kernels (geometry/wkt.py parse_wkt_z,
functions/zgeom.py) — pure-python known answers."""

import numpy as np
import pytest

from gdal_spark.functions.zgeom import _force2d, _force3d, _length3d, _z_of
from gdal_spark.geometry.wkt import parse_wkt, parse_wkt_z, payload_to_wkt_z


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
