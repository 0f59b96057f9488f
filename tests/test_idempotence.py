"""SURVEY §5: idempotence — running an operator twice over the same
input yields byte-identical output (no hidden state, no
nondeterministic ids), and re-running a written stage is a no-op."""

from __future__ import annotations

from dle import datagen
from dle.operators.overlay import dissolve, tile_geoms

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(
        tuple(bytes(v) if isinstance(v, (bytes, bytearray)) else v
              for v in r) for r in df.collect())


def test_dissolve_idempotent_across_runs(spark):
    b = datagen.bands_1d(spark, SF).select("designation", "band", "geom")
    d1 = _rows(dissolve(b, ["designation", "band"]))
    d2 = _rows(dissolve(b, ["designation", "band"]))
    assert d1 == d2
    # dissolving an already-dissolved layer is a fixpoint (same areas,
    # same geometry bytes after one more snap/assemble round)
    once = dissolve(b, ["designation", "band"])
    twice = dissolve(once, ["designation", "band"])
    assert _rows(once) == _rows(twice)


def test_tile_idempotent(spark):
    lay = datagen.layers_poly(spark, SF).limit(40).select("feat_id",
                                                          "geom")
    t1 = _rows(tile_geoms(lay, 3).select("feat_id", "cell", "geom"))
    t2 = _rows(tile_geoms(lay, 3).select("feat_id", "cell", "geom"))
    assert t1 == t2
