"""Safe-op robustness audit (SURVEY §2 I2/I3, VERDICT r1 #8).

The reference's Safe_Intersection/Safe_Difference ladders fall back to
lossy repairs and LOG it (/root/reference/sql/ST_Safe_Difference.sql:
32-80). The slab kernel claims it can't throw AND doesn't silently
lose area: ring assembly must conserve the sweep's trapezoid area
exactly, and the defensive broken-chain drop (geom/kernel.py) must
never fire. Hypothesis feeds degenerate ring soups — collinear runs,
spikes, duplicate vertices, bowties, zero-area rings — through every
boolean op and checks both claims, plus the Spark accumulator plumbing
that surfaces drops cluster-wide."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import example, given, settings, strategies as st

from dle.geom import kernel as K


def _ring(ps):
    return np.array([(float(x), float(y)) for x, y in ps]
                    + [(float(ps[0][0]), float(ps[0][1]))],
                    dtype=np.float64)


coord = st.integers(min_value=0, max_value=24)
point = st.tuples(coord, coord)
ring = st.lists(point, min_size=3, max_size=9).map(_ring)
soup = st.lists(ring, min_size=1, max_size=5)


def _audit(op_rings, a_t):
    """Assembled rings must carry the sweep's area up to the vertex
    quantum (2^-20 grid units per vertex — kernel _Q) and no fragment
    may have been dropped. A dropped fragment loses O(1) area on these
    integer-coordinate soups; quantization noise is ~1e-6."""
    dropped = K.pop_dropped_fragments()
    assert dropped == 0, f"{dropped} ring fragments silently dropped"
    a_r = K.area(op_rings)
    assert a_r == pytest.approx(a_t, abs=2e-3), \
        f"assembly lost area: rings {a_r} vs sweep {a_t}"


@given(soup)
@settings(max_examples=400, deadline=None)
def test_make_valid_conserves_sweep_area(rs):
    K.pop_dropped_fragments()
    out = K.boolean(rs, [], "a", grid=1.0)
    _audit(out, K.boolean_area(rs, [], "a", grid=1.0))


@given(soup, soup)
@settings(max_examples=300, deadline=None)
def test_difference_conserves_sweep_area(a, b):
    K.pop_dropped_fragments()
    out = K.boolean(a, b, "diff", grid=1.0)
    _audit(out, K.boolean_area(a, b, "diff", grid=1.0))


@given(soup, soup)
@settings(max_examples=300, deadline=None)
@example(
    # r7 regression pin: a proper crossing whose float x lands within
    # 2^-21 of the slab boundary at x=16 used to emit a sub-quantum
    # sliver trap whose zero-quantized-width segments broke 5 ring
    # chains (_assemble now drops sliver traps before stitching)
    a=[_ring([(0, 0), (1, 10), (23, 0)])],
    b=[_ring([(16, 0), (16, 1), (9, 7), (20, 1), (0, 0)])],
)
def test_intersection_conserves_sweep_area(a, b):
    K.pop_dropped_fragments()
    out = K.boolean(a, b, "and", grid=1.0)
    _audit(out, K.boolean_area(a, b, "and", grid=1.0))


@given(soup)
@settings(max_examples=200, deadline=None)
def test_make_valid_resnap_drift_bounded(rs):
    """Kernel outputs sit at rational (sub-grid) coordinates, so a
    second pass at the SAME grid re-snaps them; the area drift is
    bounded by perimeter * grid / 2 (the bound the pipeline's
    accumulate-and-reparse loop relies on). Found by this fuzz suite:
    strict idempotence is FALSE for slanted unit-scale shapes — e.g.
    triangle (0,0),(1,0),(2,1) collapses at grid=1 — and that bound is
    exactly why production uses GRID=0.1 m on kilometer geometry."""
    once = K.boolean(rs, [], "a", grid=1.0)
    twice = K.boolean(once, [], "a", grid=1.0)
    perim = sum(
        float(np.hypot(*(r[1:] - r[:-1]).T).sum()) for r in once)
    bound = 0.5 * perim + 1e-6
    assert abs(K.area(twice) - K.area(once)) <= bound


@given(st.lists(ring, min_size=1, max_size=4))
@settings(max_examples=150, deadline=None)
def test_planarize_faces_are_positive_and_labeled(rs):
    """Flagship-op audit: every planarize face has positive area and a
    non-empty label set (faces only exist where something covers
    them), and the single-polygon case reproduces that polygon's own
    valid area exactly. (A merged-operand 'union' oracle is NOT valid
    here: opposite orientations and figure-8 windings cancel across
    polygons while planarize correctly covers per-tag nonzero winding
    — found by this fuzz; the cross-polygon invariant lives in
    test_planarize_label_areas_match_booleans.)"""
    tagged = [(i, [r]) for i, r in enumerate(rs)]
    faces = K.planarize(tagged, grid=1.0, with_rings=False)
    assert all(f.area_m2 > 0 for f in faces)
    assert all(len(f.labels) > 0 for f in faces)
    one = K.planarize([(0, [rs[0]])], grid=1.0, with_rings=False)
    want = K.boolean_area([rs[0]], [], "a", grid=1.0)
    assert sum(f.area_m2 for f in one) == pytest.approx(want, abs=1e-6)


@given(st.lists(ring, min_size=2, max_size=4))
@settings(max_examples=150, deadline=None)
def test_planarize_label_areas_match_booleans(rs):
    """Each tag's total face area (summed over faces containing the
    tag) must equal that polygon's own valid area intersected with
    nothing — i.e. the boolean 'a' area of the tag's rings."""
    tagged = [(i, [r]) for i, r in enumerate(rs)]
    faces = K.planarize(tagged, grid=1.0, with_rings=False)
    for i, r in enumerate(rs):
        got = sum(f.area_m2 for f in faces if i in f.labels)
        want = K.boolean_area([r], [], "a", grid=1.0)
        assert got == pytest.approx(want, abs=1e-6), i


def test_lossy_accumulator_plumbing(spark):
    """The Spark accumulator surfaces worker-side drops: 0 on clean
    inputs (incl. bowties, which repair losslessly), and the drain path
    actually runs inside the executors."""
    from dle import datagen, telemetry
    from dle.operators.overlay import dissolve

    acc = telemetry.enable(spark)
    lay = datagen.layers_poly(spark, "/root/testdata/sf0.001").limit(60)
    dissolve(lay.select("designation", "geom"), ["designation"]).count()
    assert acc.value == 0
    telemetry.LOSSY_ACC = None  # don't leak into other tests
