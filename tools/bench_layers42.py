"""42-layer registry parity bench (VERDICT r1 #10): the reference runs
42 designation layers (sources_designations.csv); the oracle fixtures
use 8. This measures the A5 precedence step at L=42 in BOTH forms —
the sequential driver loop (42 barriers) and the fused per-cell fold
(one shuffle) — on the same inputs, and appends the numbers to
BENCH/BASELINE.md.

    python tools/bench_layers42.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from dle import datagen  # noqa: E402
from dle.config import DEFAULT_DEPTH  # noqa: E402
from dle.operators.overlay import (  # noqa: E402
    dissolve, insert_difference, insert_difference_fused, tile_geoms,
    with_area,
)
from dle.session import get_spark  # noqa: E402

L = 42


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("dle-bench-42", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    layers = datagen.layers_poly(spark, sf, n_orders=L)
    tiled = tile_geoms(
        layers.select("designation", "process_order", "geom"),
        DEFAULT_DEPTH).drop("bx0", "by0", "bx1", "by1")
    agg = dissolve(tiled, ["cell", "designation", "process_order"])
    agg.persist().count()  # shared input, excluded from both timings

    t0 = time.perf_counter()
    fused = insert_difference_fused(agg)
    a_f = with_area(fused).agg(F.sum("area_m2")).collect()[0][0]
    t_fused = time.perf_counter() - t0

    t0 = time.perf_counter()
    acc = None
    for po in range(1, L + 1):
        src = agg.filter(F.col("process_order") == po)
        new = insert_difference(acc, src)
        acc = new if acc is None else acc.unionByName(new)
        acc = acc.localCheckpoint(eager=False)
    a_l = with_area(acc).agg(F.sum("area_m2")).collect()[0][0]
    t_loop = time.perf_counter() - t0

    assert abs(a_f - a_l) <= 1e-6 * max(a_f, 1.0), (a_f, a_l)
    out = {
        "metric": "A5 precedence at 42 layers (reference registry scale)",
        "sf": sf, "layers": L,
        "loop_sec": round(t_loop, 2), "fused_sec": round(t_fused, 2),
        "speedup": round(t_loop / t_fused, 2),
        "area_match": True,
    }
    print(json.dumps(out))

    md = Path(__file__).resolve().parents[1] / "BENCH" / "BASELINE.md"
    text = md.read_text()
    marker = "## 42-layer registry parity"
    endmark = "<!-- /42-layer -->"
    section = f"""{marker}

A5 precedence at the reference's registry scale (42 layers,
sources_designations.csv) on {sf}, local[32], depth {DEFAULT_DEPTH}:

| form | wall (s) |
|---|---|
| sequential loop (42 barriers) | {out['loop_sec']} |
| fused per-cell fold (1 shuffle) | {out['fused_sec']} |

Speedup {out['speedup']}x; total output areas identical. The loop
form's cost grows with L (one wide job + lineage checkpoint per
layer); the fused fold is L-independent in job count, which is why it
is the default for large registries.
{endmark}
"""
    if marker in text:
        head, rest = text.split(marker, 1)
        # preserve anything after our own section's end marker
        tail = rest.split(endmark, 1)[1] if endmark in rest else ""
        text = head + section + tail
    else:
        text = text + "\n" + section
    md.write_text(text)


if __name__ == "__main__":
    main()
