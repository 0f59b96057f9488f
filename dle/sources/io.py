"""Sinks/sources (SURVEY §2 C3/C4).

`dump` is the pg2ogr GPKG-dump analogue (designatedlands.py:1200-1234):
array columns are flattened with ';' separators
(array_to_string(arr, ';') -> F.array_join) and geometry stays WKB.
Parquet is the interchange format (GPKG needs GDAL, absent here); a
geopandas export hook is gated behind an import-try for environments
that have it.
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


def export_gpkg(df: DataFrame, path: str, layer: str = "overlay"):
    """Test-scale GPKG export via geopandas if available (C4); the
    sandbox has no GDAL so this raises cleanly otherwise."""
    try:
        import geopandas as gpd  # noqa: F401
        from shapely import wkb as swkb  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "GPKG export needs geopandas+shapely (not in sandbox); "
            "use dump() -> parquet instead") from e
    pdf = flatten_arrays(df).toPandas()
    pdf["geometry"] = pdf.pop("geom").map(
        lambda b: swkb.loads(bytes(b)))
    g = gpd.GeoDataFrame(pdf, geometry="geometry")
    g.to_file(path, layer=layer, driver="GPKG")
