"""WKT codec for the full simple-features type set.

Replaces the reference's OGRGeometry WKT import/export
(ogr/ogrgeometry.cpp importFromWkt/exportToWkt) for the geometry types
the engine carries.  Parsed form:

    ("POINT",        [array([[x, y]])])
    ("LINESTRING",   [array Nx2])            # LINEARRING likewise
    ("POLYGON",      [ring0 Nx2, ring1 Nx2, ...])      # ring0 = shell
    ("MULTIPOLYGON", [poly0_rings, poly1_rings, ...])  # list of list of Nx2
    ("MULTIPOINT",      [array Nx2])          # both WKT spellings accepted
    ("MULTILINESTRING", [part0 Nx2, ...])
    ("GEOMETRYCOLLECTION", [(type, payload), ...])      # recursive

Hand-rolled split parser (no regex) — it runs inside pandas UDF batches,
so per-call overhead matters.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "parse_wkt",
    "point_wkt",
    "polygon_wkt",
    "wkt_type",
    "parse_wkt_z",
    "payload_to_wkt_z",
    "parse_wkt_zm",
    "payload_to_wkt_zm",
]


def _coords(text: str) -> np.ndarray:
    """'1 2, 1 3, 3 3' -> (N,2) float64 array."""
    pts = []
    for pair in text.split(","):
        parts = pair.split()
        pts.append((float(parts[0]), float(parts[1])))
    return np.asarray(pts, dtype=np.float64)


def _split_rings(body: str) -> list[np.ndarray]:
    """'(r1),(r2)' -> [ring arrays]; body has outer parens stripped already."""
    rings = []
    depth = 0
    start = 0
    for i, ch in enumerate(body):
        if ch == "(":
            if depth == 0:
                start = i + 1
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                rings.append(_coords(body[start:i]))
    return rings


def wkt_type(wkt: str) -> str:
    head = wkt.lstrip()
    i = head.find("(")
    return (head[:i] if i >= 0 else head).strip().upper()


# ------------------------------------------------------------ Z variants
# The reference's 2.5-D geometry classes (ogr/ogr_core.h:447-498
# wkbPoint25D family; importFromWkt accepts both "POINT Z (..)" and
# bare 3-coordinate vertices).  parse_wkt_z keeps the third coordinate
# as (N,3) arrays; parse_wkt (above) stays strictly 2-D for the
# planar kernels.


def _coords3(text: str) -> tuple[np.ndarray, bool]:
    """'1 2 3, ...' -> ((N,3) array, has_z); z = 0 for 2-D vertices."""
    pts = []
    has_z = False
    for pair in text.split(","):
        parts = pair.split()
        z = 0.0
        if len(parts) >= 3:
            z = float(parts[2])
            has_z = True
        pts.append((float(parts[0]), float(parts[1]), z))
    return np.asarray(pts, dtype=np.float64), has_z


def parse_wkt_z(wkt: str):
    """Z-aware parse -> (type, payload with (N,3) arrays, has_z).
    ``has_z`` is True when the tag carries ' Z' or any vertex has a
    third coordinate (the reference accepts both spellings)."""
    s = wkt.strip()
    i = s.find("(")
    if i < 0:
        head = s.upper().split()
        return (head[0] if head else "EMPTY", [], "Z" in head[1:])
    tag = s[:i].strip().upper()
    tagged_z = tag.endswith(" Z")
    typ = tag[:-2].strip() if tagged_z else tag
    body = s[i:]
    if typ == "POINT":
        pts, has_z = _coords3(body.strip()[1:-1])
        return "POINT", [pts], tagged_z or has_z
    if typ == "LINESTRING":
        pts, has_z = _coords3(body.strip()[1:-1])
        return "LINESTRING", [pts], tagged_z or has_z
    if typ == "POLYGON":
        rings = []
        any_z = False
        depth = 0
        start = 0
        inner = body.strip()[1:-1]
        for j, ch in enumerate(inner):
            if ch == "(":
                if depth == 0:
                    start = j + 1
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    r, hz = _coords3(inner[start:j])
                    any_z |= hz
                    rings.append(r)
        return "POLYGON", rings, tagged_z or any_z
    raise ValueError(f"parse_wkt_z: unsupported type {typ}")


def payload_to_wkt_z(typ: str, payload, has_z: bool) -> str:
    """Serialize a (N,3) payload: 'TYPE Z (x y z,...)' when ``has_z``,
    else the canonical 2-D spelling (third coordinate dropped —
    OGRGeometry::flattenTo2D)."""
    if not payload:
        return f"{typ} Z EMPTY" if has_z else f"{typ} EMPTY"

    def vtx(p):
        if has_z:
            return f"{_fmt(p[0])} {_fmt(p[1])} {_fmt(p[2])}"
        return f"{_fmt(p[0])} {_fmt(p[1])}"

    tag = f"{typ} Z" if has_z else typ
    if typ == "POINT":
        return f"{tag} ({vtx(payload[0][0])})"
    if typ == "LINESTRING":
        return f"{tag} (" + ",".join(vtx(p) for p in payload[0]) + ")"
    if typ == "POLYGON":
        inner = ",".join(
            "(" + ",".join(vtx(p) for p in r) + ")" for r in payload
        )
        return f"{tag} ({inner})"
    raise ValueError(f"payload_to_wkt_z: unsupported type {typ}")


# --------------------------------------------------------- ZM variants
# Full ISO SQL/MM dimension preamble (ogr/ogrgeometry.cpp:1808
# importPreambleFromWkt; type codes ogr/ogr_core.h:465-498 wkbPointM /
# wkbPointZM families).  Tag rules mirrored from the reference:
#   "TYPE Z (..)"  -> 3rd coordinate is z
#   "TYPE M (..)"  -> 3rd coordinate is m (z absent)
#   "TYPE ZM (..)" -> vertices are x y z m
#   untagged       -> 3 coords mean z, 4 mean z+m (the legacy 2.5-D
#                     acceptance importPreambleFromWkt keeps)
# Payload rows are always (x, y, z, m) with absent dimensions zeroed.


def _coords4(text: str, has_z: bool, has_m: bool):
    """Vertex list -> ((N,4) array, has_z, has_m) honouring the tag;
    untagged extra coordinates promote per the reference rule."""
    pts = []
    for pair in text.split(","):
        parts = pair.split()
        n = len(parts)
        x, y = float(parts[0]), float(parts[1])
        z = m = 0.0
        if has_z and has_m:
            z, m = float(parts[2]), float(parts[3])
        elif has_m:
            m = float(parts[2])
        elif has_z:
            z = float(parts[2])
        elif n == 3:
            z = float(parts[2])
            has_z = True
        elif n >= 4:
            z, m = float(parts[2]), float(parts[3])
            has_z = has_m = True
        pts.append((x, y, z, m))
    return np.asarray(pts, dtype=np.float64), has_z, has_m


def parse_wkt_zm(wkt: str):
    """Dimension-preamble-aware parse -> (type, payload of (N,4) arrays,
    has_z, has_m) for POINT / LINESTRING / POLYGON."""
    s = wkt.strip()
    i = s.find("(")
    if i < 0:
        head = s.upper().split()
        dims = head[1:]
        return (
            head[0] if head else "EMPTY",
            [],
            "Z" in dims or "ZM" in dims,
            "M" in dims or "ZM" in dims,
        )
    tag = s[:i].split()
    typ = tag[0].upper()
    dims = [t.upper() for t in tag[1:]]
    has_z = "Z" in dims or "ZM" in dims
    has_m = "M" in dims or "ZM" in dims
    body = s[i:]
    if typ in ("POINT", "LINESTRING"):
        pts, has_z, has_m = _coords4(body.strip()[1:-1], has_z, has_m)
        return typ, [pts], has_z, has_m
    if typ == "POLYGON":
        rings = []
        depth = 0
        start = 0
        inner = body.strip()[1:-1]
        for j, ch in enumerate(inner):
            if ch == "(":
                if depth == 0:
                    start = j + 1
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    r, has_z, has_m = _coords4(inner[start:j], has_z, has_m)
                    rings.append(r)
        return "POLYGON", rings, has_z, has_m
    raise ValueError(f"parse_wkt_zm: unsupported type {typ}")


def payload_to_wkt_zm(typ: str, payload, has_z: bool, has_m: bool) -> str:
    """Serialize an (N,4) payload with the ISO dimension tag the
    reference's exportToWkt(wkbVariantIso) emits; dropping a dimension
    here is setMeasured(FALSE) / set3D(FALSE) (ogrgeometry.cpp)."""
    dim = ("" if not (has_z or has_m) else
           " ZM" if has_z and has_m else (" Z" if has_z else " M"))
    if not payload:
        return f"{typ}{dim} EMPTY"

    def vtx(p):
        out = [_fmt(p[0]), _fmt(p[1])]
        if has_z:
            out.append(_fmt(p[2]))
        if has_m:
            out.append(_fmt(p[3]))
        return " ".join(out)

    if typ == "POINT":
        return f"POINT{dim} ({vtx(payload[0][0])})"
    if typ == "LINESTRING":
        return f"LINESTRING{dim} (" + ",".join(vtx(p) for p in payload[0]) + ")"
    if typ == "POLYGON":
        inner = ",".join(
            "(" + ",".join(vtx(p) for p in r) + ")" for r in payload
        )
        return f"POLYGON{dim} ({inner})"
    raise ValueError(f"payload_to_wkt_zm: unsupported type {typ}")


def parse_wkt(wkt: str):
    """Parse WKT -> (type, payload); see module docstring for payload shape."""
    s = wkt.strip()
    i = s.find("(")
    if i < 0:
        head = s.upper().split()
        return (head[0] if head else "EMPTY", [])
    typ = s[:i].strip().upper().replace(" Z", "")
    body = s[i:]
    if typ == "POINT":
        return "POINT", [_coords(body.strip()[1:-1])]
    if typ in ("LINESTRING", "LINEARRING"):
        return typ, [_coords(body.strip()[1:-1])]
    if typ == "POLYGON":
        return "POLYGON", _split_rings(body.strip()[1:-1])
    if typ == "MULTIPOINT":
        # both reference spellings (ogrmultipoint.cpp importFromWkt):
        # legacy "MULTIPOINT (1 2,3 4)" and ISO "MULTIPOINT ((1 2),(3 4))"
        inner = body.strip()[1:-1].replace("(", " ").replace(")", " ")
        return "MULTIPOINT", [_coords(inner)]
    if typ == "MULTILINESTRING":
        return "MULTILINESTRING", _split_rings(body.strip()[1:-1])
    if typ == "GEOMETRYCOLLECTION":
        # split members at depth-0 commas, recurse; payload is a list of
        # (type, payload) pairs (the one nested payload shape)
        inner = body.strip()[1:-1]
        members = []
        depth = 0
        start = 0
        for j, ch in enumerate(inner):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == "," and depth == 0:
                members.append(parse_wkt(inner[start:j]))
                start = j + 1
        if inner[start:].strip():
            members.append(parse_wkt(inner[start:]))
        return "GEOMETRYCOLLECTION", members
    if typ in ("MULTIPOLYGON", "TIN", "POLYHEDRALSURFACE"):
        # strip one paren level, then each '(...)...(...)' group is a
        # polygon/patch (TIN and POLYHEDRALSURFACE share the multipolygon
        # body grammar — ogr_core.h wkbPolyhedralSurface=15/wkbTIN=16,
        # ogrpolyhedralsurface.cpp importFromWkt)
        inner = body.strip()[1:-1]
        polys = []
        depth = 0
        start = 0
        for j, ch in enumerate(inner):
            if ch == "(":
                if depth == 0:
                    start = j
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    polys.append(_split_rings(inner[start + 1 : j]))
        return typ, polys
    raise ValueError(f"unsupported WKT type: {typ}")


def _fmt(v: float) -> str:
    if v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return repr(v)


def point_wkt(x: float, y: float) -> str:
    return f"POINT ({_fmt(x)} {_fmt(y)})"


def polygon_wkt(rings: list[np.ndarray]) -> str:
    parts = []
    for ring in rings:
        coords = ",".join(f"{_fmt(x)} {_fmt(y)}" for x, y in ring)
        parts.append(f"({coords})")
    return "POLYGON (" + ",".join(parts) + ")"


def payload_to_wkt(typ: str, payload) -> str:
    """Canonical serialization of a parsed payload — the AsText half of
    the reference's ST_AsText/ST_GeomFromText pair
    (ogrsqlitesqlfunctions.cpp:1188 REGISTER_ST_op AsText/GeomFromText).
    Round-tripping messy WKT through parse + this emits one spelling:
    single space after the tag, no space after commas, integral floats
    collapsed (``_fmt``)."""
    if not payload:
        return f"{typ} EMPTY"
    if typ == "POINT":
        x, y = payload[0][0]
        return point_wkt(float(x), float(y))
    if typ in ("LINESTRING", "LINEARRING"):
        coords = ",".join(f"{_fmt(x)} {_fmt(y)}" for x, y in payload[0])
        return f"{typ} ({coords})"
    if typ == "POLYGON":
        return polygon_wkt(payload)
    if typ == "MULTIPOINT":
        # legacy spelling, the reference's exportToWkt default
        # (ogrmultipoint.cpp exportToWkt wkbVariantOldOgc: no inner parens)
        coords = ",".join(f"{_fmt(x)} {_fmt(y)}" for x, y in payload[0])
        return f"MULTIPOINT ({coords})"
    if typ == "MULTILINESTRING":
        inner = ",".join(
            "(" + ",".join(f"{_fmt(x)} {_fmt(y)}" for x, y in part) + ")"
            for part in payload
        )
        return f"MULTILINESTRING ({inner})"
    if typ == "GEOMETRYCOLLECTION":
        inner = ",".join(payload_to_wkt(t, p) for t, p in payload)
        return f"GEOMETRYCOLLECTION ({inner})"
    if typ in ("MULTIPOLYGON", "TIN", "POLYHEDRALSURFACE"):
        parts = []
        for rings in payload:
            inner = ",".join(
                "(" + ",".join(f"{_fmt(x)} {_fmt(y)}" for x, y in r) + ")"
                for r in rings
            )
            parts.append(f"({inner})")
        return f"{typ} (" + ",".join(parts) + ")"
    raise ValueError(f"unsupported geometry type for WKT: {typ}")
