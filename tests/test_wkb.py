"""WKB codec roundtrip + bytes-level envelope (no Spark needed).

Mirrors the reference's WKB export/prefilter pair
(ogrlayerarrow.cpp:2562 ogc.wkb; ogr_wkb.cpp:574 bounding box)."""

import numpy as np
import pytest

from gdal_spark.geometry.wkb import (
    wkb_envelope,
    wkb_to_payload,
    wkt_payload_to_wkb,
)
from gdal_spark.geometry.wkt import parse_wkt

CASES = [
    "POINT (3.5 -7.25)",
    "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))",
    "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))",
    "MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)), ((5 5, 6 5, 6 9, 5 9, 5 5)))",
]


@pytest.mark.parametrize("wkt", CASES)
def test_roundtrip(wkt):
    typ, payload = parse_wkt(wkt)
    buf = wkt_payload_to_wkb(typ, payload)
    typ2, payload2 = wkb_to_payload(buf)
    assert typ2 == typ
    flat = lambda p: (  # noqa: E731
        [r for poly in p for r in poly] if typ == "MULTIPOLYGON" else p
    )
    for a, b in zip(flat(payload), flat(payload2)):
        assert np.array_equal(np.asarray(a, dtype=np.float64), b)


@pytest.mark.parametrize("wkt", CASES)
def test_envelope_matches_parsed(wkt):
    typ, payload = parse_wkt(wkt)
    buf = wkt_payload_to_wkb(typ, payload)
    got = wkb_envelope(buf)
    rings = (
        [r for poly in payload for r in poly] if typ == "MULTIPOLYGON" else payload
    )
    pts = np.vstack(rings)
    want = (pts[:, 0].min(), pts[:, 1].min(), pts[:, 0].max(), pts[:, 1].max())
    assert got == pytest.approx(want)


COLLECTION_CASES = [
    "LINESTRING (0 0,3 4,-2 7)",
    "MULTIPOINT (1 2,3 4,-5 6)",
    "MULTILINESTRING ((0 0,1 1),(2 2,3 3,4 0))",
    "GEOMETRYCOLLECTION (POINT (1 2),LINESTRING (0 0,5 5),"
    "POLYGON ((0 0,4 0,4 4,0 0)),MULTIPOINT (7 8,9 10))",
    "GEOMETRYCOLLECTION (GEOMETRYCOLLECTION (POINT (1 2)),"
    "MULTIPOLYGON (((0 0,1 0,1 1,0 0))))",
]


@pytest.mark.parametrize("wkt", COLLECTION_CASES)
def test_collection_roundtrip_via_wkt(wkt):
    """WKT -> payload -> WKB -> payload -> WKT must be the canonical
    spelling (containers carry per-member WKB headers, OGC SFA /
    ogrgeometrycollection.cpp exportToWkbInternal)."""
    from gdal_spark.geometry.wkt import payload_to_wkt

    typ, payload = parse_wkt(wkt)
    typ2, payload2 = wkb_to_payload(wkt_payload_to_wkb(typ, payload))
    assert payload_to_wkt(typ2, payload2) == payload_to_wkt(typ, payload)


@pytest.mark.parametrize("wkt,want", [
    ("LINESTRING (0 0,3 4,-2 7)", (-2, 0, 3, 7)),
    ("MULTIPOINT (1 2,3 4,-5 6)", (-5, 2, 3, 6)),
    ("MULTILINESTRING ((0 0,1 1),(2 2,3 3,4 0))", (0, 0, 4, 3)),
    ("GEOMETRYCOLLECTION (POINT (1 2),POLYGON ((0 0,9 0,9 9,0 0)))",
     (0, 0, 9, 9)),
])
def test_collection_envelopes(wkt, want):
    typ, payload = parse_wkt(wkt)
    assert wkb_envelope(wkt_payload_to_wkb(typ, payload)) == pytest.approx(want)


def test_envelope_is_header_walk_only():
    """Envelope must not allocate ring arrays (zero-copy views)."""
    typ, payload = parse_wkt(CASES[2])
    buf = wkt_payload_to_wkb(typ, payload)
    # corrupting a coordinate changes the envelope (it IS read) ...
    arr = bytearray(buf)
    arr[9 + 4 : 9 + 12] = np.array([99.0]).tobytes() + arr[9 + 4 + 8 : 9 + 12]
    assert wkb_envelope(bytes(arr))[2] == 99.0
