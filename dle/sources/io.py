"""Sinks/sources (SURVEY §2 C3/C4).

`dump` is the pg2ogr GPKG-dump analogue (designatedlands.py:1200-1234):
array columns are flattened with ';' separators
(array_to_string(arr, ';') -> F.array_join) and geometry stays WKB.
Parquet is the distributed interchange format; `export_gpkg` writes a
REAL GeoPackage through stdlib sqlite3 (a GPKG is an SQLite container
with GPB-wrapped WKB — no GDAL needed to write one), with `read_gpkg`
as the round-trip verifier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import ArrayType


def flatten_arrays(df: DataFrame, sep: str = ";") -> DataFrame:
    """array_to_string(arr, ';') on every array column
    (designatedlands.py:1202-1207)."""
    for f in df.schema.fields:
        if isinstance(f.dataType, ArrayType):
            df = df.withColumn(
                f.name,
                F.array_join(F.col(f.name).cast("array<string>"), sep))
    return df


def dump(df: DataFrame, path: str, partition_by: str | None = "cell",
         sort_within: str | None = None) -> None:
    """Write an overlay output: arrays flattened, partitioned by cell
    (partition pruning on read), optionally sorted within partitions
    so parquet min/max stats prune cell prefixes like the reference's
    text_pattern_ops index (designatedlands.py:1085-1090)."""
    out = flatten_arrays(df)
    if sort_within:
        out = out.sortWithinPartitions(sort_within)
    w = out.write.mode("overwrite")
    if partition_by and partition_by in df.columns:
        w = w.partitionBy(partition_by)
    w.parquet(path)


_SRS_3005 = (
    'PROJCS["NAD83 / BC Albers",GEOGCS["NAD83",DATUM["North_American_'
    'Datum_1983",SPHEROID["GRS 1980",6378137,298.257222101]],PRIMEM['
    '"Greenwich",0],UNIT["degree",0.0174532925199433]],PROJECTION['
    '"Albers_Conic_Equal_Area"],PARAMETER["latitude_of_center",45],'
    'PARAMETER["longitude_of_center",-126],PARAMETER["standard_'
    'parallel_1",50],PARAMETER["standard_parallel_2",58.5],PARAMETER['
    '"false_easting",1000000],PARAMETER["false_northing",0],UNIT['
    '"metre",1],AUTHORITY["EPSG","3005"]]')


def export_gpkg(df: DataFrame, path: str, layer: str = "overlay",
                geom_col: str = "geom", srs_id: int = 3005) -> int:
    """REAL GeoPackage export (C4 — the reference's pg2ogr GPKG dump,
    designatedlands.py:1200-1234) in pure stdlib sqlite3: a GPKG is an
    SQLite file with three registry tables and GeoPackageBinary blobs
    (8-byte GPB header + standard WKB — which the engine already
    speaks). No GDAL required to WRITE it; GDAL/QGIS reads the result
    directly. Returns the feature count.

    Scale note: like the reference's dump, this is the FINAL-ARTIFACT
    exporter — a driver-side single-file write at the end of a run.
    The distributed interchange format stays `dump()` -> parquet."""
    import sqlite3
    from pathlib import Path

    Path(path).unlink(missing_ok=True)
    out = flatten_arrays(df)
    rows = out.collect()
    cols = [(f.name, f.dataType.simpleString()) for f in out.schema.fields
            if f.name != geom_col]
    typ = {"bigint": "INTEGER", "int": "INTEGER", "smallint": "INTEGER",
           "double": "REAL", "float": "REAL", "string": "TEXT",
           "binary": "BLOB", "boolean": "INTEGER"}

    con = sqlite3.connect(path)
    con.execute("PRAGMA application_id = 0x47504B47")  # 'GPKG'
    con.execute("PRAGMA user_version = 10200")         # GPKG 1.2
    con.execute("""CREATE TABLE gpkg_spatial_ref_sys (
        srs_name TEXT NOT NULL, srs_id INTEGER PRIMARY KEY,
        organization TEXT NOT NULL,
        organization_coordsys_id INTEGER NOT NULL,
        definition TEXT NOT NULL, description TEXT)""")
    con.executemany(
        "INSERT INTO gpkg_spatial_ref_sys VALUES (?,?,?,?,?,?)",
        [("Undefined cartesian SRS", -1, "NONE", -1, "undefined", None),
         ("Undefined geographic SRS", 0, "NONE", 0, "undefined", None),
         ("NAD83 / BC Albers", 3005, "EPSG", 3005, _SRS_3005, None)])
    con.execute("""CREATE TABLE gpkg_contents (
        table_name TEXT NOT NULL PRIMARY KEY, data_type TEXT NOT NULL,
        identifier TEXT UNIQUE, description TEXT DEFAULT '',
        last_change DATETIME NOT NULL DEFAULT
          (strftime('%Y-%m-%dT%H:%M:%fZ','now')),
        min_x DOUBLE, min_y DOUBLE, max_x DOUBLE, max_y DOUBLE,
        srs_id INTEGER)""")
    con.execute("""CREATE TABLE gpkg_geometry_columns (
        table_name TEXT NOT NULL, column_name TEXT NOT NULL,
        geometry_type_name TEXT NOT NULL, srs_id INTEGER NOT NULL,
        z TINYINT NOT NULL, m TINYINT NOT NULL,
        CONSTRAINT pk_geom_cols PRIMARY KEY (table_name, column_name))""")
    con.execute(
        "INSERT INTO gpkg_contents (table_name, data_type, identifier,"
        " srs_id) VALUES (?,?,?,?)", (layer, "features", layer, srs_id))
    con.execute("INSERT INTO gpkg_geometry_columns VALUES (?,?,?,?,0,0)",
                (layer, geom_col, "MULTIPOLYGON", srs_id))

    coldefs = ", ".join(f'"{c}" {typ.get(t, "TEXT")}' for c, t in cols)
    con.execute(f'CREATE TABLE "{layer}" (fid INTEGER PRIMARY KEY'
                f' AUTOINCREMENT, "{geom_col}" BLOB'
                + (f", {coldefs}" if cols else "") + ")")
    # GPB header: magic 'GP', version 0, flags 0b01 (LE, no envelope)
    import struct
    gpb = b"GP\x00\x01" + struct.pack("<i", srs_id)
    ins = (f'INSERT INTO "{layer}" ("{geom_col}"'
           + "".join(f', "{c}"' for c, _ in cols) + ") VALUES ("
           + ",".join("?" * (1 + len(cols))) + ")")
    n = 0
    for r in rows:
        g = r[geom_col]
        vals = [gpb + bytes(g) if g is not None else None]
        vals += [bytes(r[c]) if t == "binary" and r[c] is not None
                 else r[c] for c, t in cols]
        con.execute(ins, vals)
        n += 1
    con.commit()
    con.close()
    return n


def read_gpkg(path: str, layer: str) -> list[dict]:
    """Round-trip reader for export_gpkg (and any GPKG feature table
    with GPB-wrapped geometries): strips the GPB header back to plain
    WKB. Pure stdlib — the verification side of the C4 sink."""
    import sqlite3
    import struct
    con = sqlite3.connect(path)
    con.row_factory = sqlite3.Row
    (gcol,) = con.execute(
        "SELECT column_name FROM gpkg_geometry_columns WHERE"
        " table_name = ?", (layer,)).fetchone()
    out = []
    for r in con.execute(f'SELECT * FROM "{layer}"'):
        d = dict(r)
        blob = d[gcol]
        if blob is not None:
            if blob[:2] != b"GP":
                raise ValueError("not a GeoPackageBinary blob")
            flags = blob[3]
            env_code = (flags >> 1) & 0b111
            env_len = {0: 0, 1: 32, 2: 48, 3: 48, 4: 64}[env_code]
            d[gcol] = blob[8 + env_len:]
        out.append(d)
    con.close()
    return out
