"""spark-submit entry point for the generic pairwise overlay — the
reference's user-facing `overlay IN OUT` command
(/root/reference/designatedlands.py:1237-1285): intersect an arbitrary
input layer with another (typically the designatedlands output),
carrying both attribute sets.

    python tools/make_pyfiles.py
    spark-submit --master <cluster> --py-files dist/dle.zip \
        jobs/overlay_job.py <in_a.parquet> <in_b.parquet> <out_dir> [depth]

Inputs are parquet with a WKB `geom` binary column plus attributes
(column collisions rejected, reference :1017-1028). Output is cell-
partitioned parquet with both attribute sets + intersection geometry,
arrays flattened for portability (C4 dump semantics)."""

from __future__ import annotations

import sys
from pathlib import Path

# local runs without --py-files: repo root on path
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import SparkSession  # noqa: E402


def main():
    from dle.config import pop_config
    argv = sys.argv[1:]
    cfg = pop_config(argv)   # --config FILE (reference INI format)
    if len(argv) < 3:
        sys.exit("usage: overlay_job.py [--config FILE] IN_A IN_B"
                 " OUT_DIR [depth]")
    in_a, in_b, out_dir = argv[:3]
    depth = int(argv[3]) if len(argv) > 3 else cfg["depth"]

    spark = SparkSession.builder.appName("dle-overlay").getOrCreate()
    from dle.operators.intersect import spatial_overlay
    from dle.sources.io import dump

    a = spark.read.parquet(in_a)
    b = spark.read.parquet(in_b)
    out = spatial_overlay(a, b, depth=depth)
    dump(out, out_dir)
    n = spark.read.parquet(out_dir).count()
    print(f"overlay wrote {n} rows to {out_dir}")


if __name__ == "__main__":
    main()
