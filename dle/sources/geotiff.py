"""Minimal GeoTIFF writer/reader in pure numpy + struct (SURVEY §2 B3:
the reference's final artifact is designatedlands.tif written through
rasterio — /root/reference/designatedlands.py:956-991).

No GDAL exists in the sandbox, but a single-band uint8 GeoTIFF is just
a classic little-endian TIFF with three geo tags — entirely writable
(and re-readable, for the round-trip test) at the struct level, the
same move as the BMP/WAV codecs in operators/multimodal.py. Output
carries ModelPixelScale + ModelTiepoint + a GeoKeyDirectory declaring
EPSG:3005 (BC Albers, the reference's CRS) and a GDAL_NODATA tag, so
GDAL/QGIS reads it as a georeferenced raster as-is.

Scale note: this is the FINAL-ARTIFACT exporter (one mosaic written by
the driver at the end of a run, exactly like the reference's single
output tif). The distributed representation stays per-cell parquet
blocks (operators/raster.py::write_raster) — the COG-tiles analogue.
"""

from __future__ import annotations

import struct

import numpy as np

# TIFF tag codes
_T_WIDTH, _T_HEIGHT = 256, 257
_T_BITS, _T_COMP, _T_PHOTO = 258, 259, 262
_T_STRIPOFF, _T_SPP, _T_ROWSPERSTRIP, _T_STRIPCNT = 273, 277, 278, 279
_T_SAMPLEFMT = 339
_T_PIXSCALE, _T_TIEPOINT, _T_GEOKEYS = 33550, 33922, 34735
_T_GDALMETA, _T_NODATA = 42112, 42113

_SHORT, _LONG, _DOUBLE, _ASCII = 3, 4, 12, 2
EPSG_BC_ALBERS = 3005


def gdal_metadata_xml(legend: list[tuple[int, str]]) -> str:
    """`<GDALMetadata>` payload for TIFF tag 42112 (GDAL's registered
    ASCII metadata tag) carrying the VALUE -> DESCRIPTION legend as
    band-level items, so the legend lives IN the .tif itself (shown by
    `gdalinfo` as band metadata) even when the PAM `.aux.xml` RAT
    sidecar is separated from the artifact (VERDICT r4 missing #3;
    reference legend: /root/reference/designatedlands.py:116-142)."""
    from xml.sax.saxutils import escape
    items = "".join(
        f'<Item name="CLASS_{int(v)}" sample="0">{escape(str(d))}</Item>'
        for v, d in legend)
    return f"<GDALMetadata>{items}</GDALMetadata>"


def write_geotiff(arr: np.ndarray, path: str, x0: float, y_top: float,
                  res: float, epsg: int = EPSG_BC_ALBERS,
                  nodata: int | None = 255,
                  gdal_metadata: str | None = None) -> None:
    """Write a single-band uint8 GeoTIFF. ``arr[0, :]`` is the NORTH
    (top) row; (x0, y_top) is the outer corner of pixel (0, 0);
    ``res`` is meters/pixel (square pixels, north-up).
    ``gdal_metadata`` (e.g. from ``gdal_metadata_xml``) is embedded
    verbatim as TIFF tag 42112."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w = a.shape
    nod = b"" if nodata is None else (str(int(nodata)).encode() + b"\0")

    # tag list: (code, type, count, inline-or-bytes)
    def inline(t, v):
        if t == _SHORT:
            return struct.pack("<HH", v, 0)
        return struct.pack("<I", v)

    geokeys = struct.pack(
        "<16H",
        1, 1, 0, 3,            # KeyDirectoryVersion, rev 1.0, 3 keys
        1024, 0, 1, 1,         # GTModelType = projected
        1025, 0, 1, 1,         # GTRasterType = PixelIsArea
        3072, 0, 1, epsg)      # ProjectedCSType
    pixscale = struct.pack("<3d", res, res, 0.0)
    tiepoint = struct.pack("<6d", 0.0, 0.0, 0.0, x0, y_top, 0.0)

    tags: list[tuple[int, int, int, bytes | int]] = [
        (_T_WIDTH, _LONG, 1, w),
        (_T_HEIGHT, _LONG, 1, h),
        (_T_BITS, _SHORT, 1, 8),
        (_T_COMP, _SHORT, 1, 1),          # uncompressed
        (_T_PHOTO, _SHORT, 1, 1),         # BlackIsZero
        (_T_STRIPOFF, _LONG, 1, -1),      # patched below
        (_T_SPP, _SHORT, 1, 1),
        (_T_ROWSPERSTRIP, _LONG, 1, h),   # one strip
        (_T_STRIPCNT, _LONG, 1, w * h),
        (_T_SAMPLEFMT, _SHORT, 1, 1),     # unsigned int
        (_T_PIXSCALE, _DOUBLE, 3, pixscale),
        (_T_TIEPOINT, _DOUBLE, 6, tiepoint),
        (_T_GEOKEYS, _SHORT, len(geokeys) // 2, geokeys),
    ]
    if gdal_metadata is not None:
        gm = gdal_metadata.encode() + b"\0"
        tags.append((_T_GDALMETA, _ASCII, len(gm), gm))
    if nod:
        tags.append((_T_NODATA, _ASCII, len(nod), nod))

    n = len(tags)
    ifd_off = 8
    data_off = ifd_off + 2 + 12 * n + 4     # out-of-line tag data here
    blobs, out_of_line = [], {}
    for code, t, cnt, v in tags:
        if isinstance(v, bytes) and len(v) > 4:
            out_of_line[code] = data_off + sum(len(b) for b in blobs)
            blobs.append(v)
    strip_off = data_off + sum(len(b) for b in blobs)

    buf = bytearray()
    buf += b"II" + struct.pack("<HI", 42, ifd_off)
    buf += struct.pack("<H", n)
    for code, t, cnt, v in sorted(tags):
        if code == _T_STRIPOFF:
            val = struct.pack("<I", strip_off)
        elif isinstance(v, bytes):
            val = (v + b"\0" * (4 - len(v)) if len(v) <= 4
                   else struct.pack("<I", out_of_line[code]))
        else:
            val = inline(t, v)
        buf += struct.pack("<HHI", code, t, cnt) + val[:4]
    buf += struct.pack("<I", 0)             # no next IFD
    for b in blobs:
        buf += b
    buf += a.tobytes()
    with open(path, "wb") as f:
        f.write(buf)


def read_geotiff(path: str) -> tuple[np.ndarray, dict]:
    """Round-trip reader for write_geotiff's output (also accepts any
    uncompressed single-strip uint8 LE classic TIFF). Returns
    (array, meta) with meta = {x0, y_top, res, epsg, nodata}."""
    raw = open(path, "rb").read()
    if raw[:4] != b"II\x2a\x00":
        raise ValueError("not a little-endian classic TIFF")
    (ifd_off,) = struct.unpack_from("<I", raw, 4)
    (n,) = struct.unpack_from("<H", raw, ifd_off)
    tags = {}
    for i in range(n):
        code, t, cnt = struct.unpack_from("<HHI", raw, ifd_off + 2 + 12 * i)
        val_off = ifd_off + 2 + 12 * i + 8
        size = {_SHORT: 2, _LONG: 4, _DOUBLE: 8, _ASCII: 1}[t] * cnt
        if size > 4:
            (ptr,) = struct.unpack_from("<I", raw, val_off)
        else:
            ptr = val_off
        if t == _SHORT:
            v = struct.unpack_from(f"<{cnt}H", raw, ptr)
        elif t == _LONG:
            v = struct.unpack_from(f"<{cnt}I", raw, ptr)
        elif t == _DOUBLE:
            v = struct.unpack_from(f"<{cnt}d", raw, ptr)
        else:
            v = (raw[ptr:ptr + cnt].rstrip(b"\0").decode(),)
        tags[code] = v
    w, h = tags[_T_WIDTH][0], tags[_T_HEIGHT][0]
    if tags.get(_T_COMP, (1,))[0] != 1:
        raise ValueError("compressed TIFF not supported")
    off = tags[_T_STRIPOFF][0]
    arr = np.frombuffer(raw, dtype=np.uint8, count=w * h,
                        offset=off).reshape(h, w).copy()
    meta = {}
    if _T_PIXSCALE in tags and _T_TIEPOINT in tags:
        meta["res"] = tags[_T_PIXSCALE][0]
        meta["x0"] = tags[_T_TIEPOINT][3]
        meta["y_top"] = tags[_T_TIEPOINT][4]
    gk = tags.get(_T_GEOKEYS, ())
    for i in range(4, len(gk), 4):
        if gk[i] == 3072:
            meta["epsg"] = gk[i + 3]
    if _T_NODATA in tags:
        meta["nodata"] = int(tags[_T_NODATA][0])
    if _T_GDALMETA in tags:
        meta["gdal_metadata"] = tags[_T_GDALMETA][0]
    return arr, meta
