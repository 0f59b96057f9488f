"""Minimal WKB codec (little-endian, 2-D) for Point/Polygon/MultiPolygon.

Geometry interchange type of the engine: WKB bytes in a BinaryType
column (SURVEY §1.2 — geometry(…,3005) -> BinaryType WKB). The kernel's
in-memory form is ``list[np.ndarray(k,2) float64]`` — a ring list with
CCW shells / CW holes (nonzero winding semantics).
"""

from __future__ import annotations

import struct

import numpy as np

_PT = 1
_POLY = 3
_MPOLY = 6

Rings = list  # list[np.ndarray (k,2) float64]


def point_wkb(x: float, y: float) -> bytes:
    return struct.pack("<BIdd", 1, _PT, x, y)


def parse_point(buf: bytes) -> tuple[float, float]:
    _, t, x, y = struct.unpack_from("<BIdd", buf, 0)
    if t != _PT:
        raise ValueError(f"not a point: type {t}")
    return x, y


def _write_rings(rings: Rings) -> bytes:
    out = [struct.pack("<I", len(rings))]
    for r in rings:
        arr = np.asarray(r, dtype="<f8")
        if not np.array_equal(arr[0], arr[-1]):
            arr = np.vstack([arr, arr[:1]])
        out.append(struct.pack("<I", len(arr)))
        out.append(arr.tobytes())
    return b"".join(out)


def polygon_wkb(rings: Rings) -> bytes:
    return struct.pack("<BI", 1, _POLY) + _write_rings(rings)


def multipolygon_wkb(polys: list[Rings]) -> bytes:
    out = [struct.pack("<BII", 1, _MPOLY, len(polys))]
    for rings in polys:
        out.append(polygon_wkb(rings))
    return b"".join(out)


def rings_wkb(rings: Rings) -> bytes:
    """Encode a ring soup as POLYGON (single shell) or MULTIPOLYGON
    (shells split by orientation: CCW rings start new polygons, CW
    rings are holes assigned to the most recent shell that contains
    their first vertex)."""
    if not rings:
        return multipolygon_wkb([])
    shells: list[Rings] = []
    holes: list[np.ndarray] = []
    for r in rings:
        if ring_area(r) >= 0:
            shells.append([r])
        else:
            holes.append(r)
    if not shells:  # all-hole degenerate: emit as-is
        return multipolygon_wkb([[r] for r in rings])
    for h in holes:
        p = h[0]
        placed = False
        for s in shells:
            if _point_in_ring(p[0], p[1], s[0]):
                s.append(h)
                placed = True
                break
        if not placed:
            shells[0].append(h)
    if len(shells) == 1:
        return polygon_wkb(shells[0])
    return multipolygon_wkb(shells)


def _point_in_ring(x: float, y: float, ring: np.ndarray) -> bool:
    x0, y0 = ring[:-1, 0], ring[:-1, 1]
    x1, y1 = ring[1:, 0], ring[1:, 1]
    cross = (y0 <= y) != (y1 <= y)
    with np.errstate(divide="ignore", invalid="ignore"):
        xi = x0 + (y - y0) * (x1 - x0) / (y1 - y0)
    return bool(np.count_nonzero(cross & (xi > x)) & 1)


def ring_area(ring: np.ndarray) -> float:
    """Signed shoelace area (CCW positive)."""
    x, y = ring[:, 0], ring[:, 1]
    return 0.5 * float(
        np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y))


def parse(buf: bytes) -> tuple[str, object]:
    """Parse WKB -> ("point", (x, y)) | ("polygon", rings) |
    ("multipolygon", rings)  — rings flattened across sub-polygons."""
    rings, kind = [], None
    off = 0

    def read_rings(off: int) -> int:
        (n,) = struct.unpack_from("<I", buf, off)
        off += 4
        for _ in range(n):
            (k,) = struct.unpack_from("<I", buf, off)
            off += 4
            arr = np.frombuffer(buf, dtype="<f8", count=2 * k,
                                offset=off).reshape(k, 2).copy()
            off += 16 * k
            rings.append(arr)
        return off

    endian, t = struct.unpack_from("<BI", buf, off)
    if endian != 1:
        raise ValueError("big-endian WKB not supported")
    off += 5
    if t == _PT:
        x, y = struct.unpack_from("<dd", buf, off)
        return "point", (x, y)
    if t == _POLY:
        read_rings(off)
        return "polygon", rings
    if t == _MPOLY:
        (n,) = struct.unpack_from("<I", buf, off)
        off += 4
        for _ in range(n):
            e2, t2 = struct.unpack_from("<BI", buf, off)
            if e2 != 1 or t2 != _POLY:
                raise ValueError("multipolygon member must be LE polygon")
            off = read_rings(off + 5)
        return "multipolygon", rings
    raise ValueError(f"unsupported WKB type {t}")


def parse_rings(buf: bytes) -> Rings:
    kind, val = parse(buf)
    if kind == "point":
        raise ValueError("expected areal geometry, got point")
    return val
