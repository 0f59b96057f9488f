"""Spatial kNN join (north_star: "pandas UDFs for point-in-polygon,
polygon intersection, and kNN").

`knn_join_rects`: for every point, the k nearest rectangle features by
euclidean distance to the feature's boundary/interior (distance 0 when
inside). Physical recipe mirrors the PIP join: the feature side is the
small dimension table -> broadcast; distance evaluation stays JVM-side
(codegen); top-k per point is one map-side-combinable min_by chain via
window row_number over (distance, feat_id) with a deterministic
tiebreak.

Distances are exact BIGINT squared-meters (integral coordinates), so
ranking is reproducible bit-for-bit across engines and partitionings.

Scale path (10^12 points x 10^5 features): the broadcast variant is
O(points x features) per partition — fine for dimension-sized feature
sets (the reference has 42 layers). For large feature sets use
`knn_join_cells`: candidates restricted to features whose cell-ring
distance can beat the current k-th best — implemented as a cover-cells
join at a chosen depth plus ring expansion, falling back to brute force
for the (rare) points whose ring search exhausts. Round 1 ships the
broadcast variant + the cell-pruned candidate generator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from .spatial_join import explode_rect_cells


# Top-k frames persisted by knn_join_pruned, keyed PER SparkSession
# (ADVICE r3, low: a flat global let one session's call unpersist a
# frame a different session's still-unconsumed result depended on).
# Contract (VERDICT r4 #8 — the old SINGLE-OUTSTANDING-RESULT rule is
# retired): each session keeps up to _KEEP_PER_SESSION most-recent
# frames persisted, so interleaved calls that deep never silently
# recompute a prior unconsumed result's candidate join; older frames
# are unpersisted (always CORRECT — persist is an optimization, a
# released frame recomputes lazily). Entries for STOPPED sessions are
# pruned on every call (ADVICE r4, low: the cached DataFrame pins the
# session object, so without pruning a multi-session process leaked
# one entry per dead session). Release explicitly via release_cache()
# when done.
_KEEP_PER_SESSION = 4
_PERSISTED: dict[int, list] = {}  # id(session) -> [(session, df), ...]


def _prune_stopped() -> None:
    """Drop cache entries whose SparkSession has been stopped — their
    persisted frames died with the context, keeping the entry only
    pins the dead session object."""
    for k in list(_PERSISTED):
        entries = _PERSISTED[k]
        alive = False
        try:
            sess = entries[0][0] if entries else None
            alive = (sess is not None
                     and sess.sparkContext._jsc is not None)
        except Exception:
            alive = False
        if not alive:
            _PERSISTED.pop(k, None)


def release_cache(session=None) -> None:
    """Unpersist every top-k frame cached by previous knn_join_pruned
    calls in `session` (every session when None). Safe to call any
    time: a released frame recomputes lazily if still consumed
    afterwards."""
    keys = list(_PERSISTED) if session is None else [id(session)]
    for k in keys:
        for _, df in _PERSISTED.pop(k, []):
            try:
                df.unpersist(False)
            except Exception:
                pass  # session already stopped — nothing to release


def _d2(px: str, py: str) -> F.Column:
    dx = F.greatest(F.col("x0") - F.col(px), F.col(px) - F.col("x1"),
                    F.lit(0.0))
    dy = F.greatest(F.col("y0") - F.col(py), F.col(py) - F.col("y1"),
                    F.lit(0.0))
    return (dx * dx + dy * dy).cast("bigint")


def knn_join_rects(points: DataFrame, rects: DataFrame, k: int = 3,
                   px: str = "px", py: str = "py",
                   point_keys: list[str] | None = None) -> DataFrame:
    """Broadcast brute-force kNN: every point against the (small)
    feature table; returns point keys + feat_id + d2 + rank 1..k.

    OPTIMIZATION r7 (guide §4.2/§8): the original crossJoin + window
    form materialized points x features ROWS in the JVM (495k x 5k =
    2.5G rows at sf0.1) and locally sorted them below the partial
    rank limit — ~100 GB of sort spill, 90+ s. The decision needs only
    the 40-byte feature tuple, so the feature table (dimension-sized
    by this operator's contract) ships as a plain numpy broadcast and
    each Arrow batch computes exact top-k per point vectorized —
    the score matrix lives only chunk-at-a-time in numpy and nothing
    point x feature sized is ever materialized as rows. Distances,
    tiebreaks and ranks are bit-identical to the window form:
    the same float64 ops as _d2 then truncating bigint cast, ranking
    by the strictly-unique combined key d2 * n_features + feat_rank
    == (d2 asc, feat_id asc)."""
    import numpy as np
    import pandas as pd

    point_keys = point_keys or ["page_id", "cand_i"]
    feats = (rects.select("feat_id", "x0", "y0", "x1", "y1")
             .orderBy("feat_id").collect())  # dimension-sized
    fid = np.array([r["feat_id"] for r in feats], dtype=np.int64)
    fx0 = np.array([r["x0"] for r in feats], dtype=np.float64)
    fy0 = np.array([r["y0"] for r in feats], dtype=np.float64)
    fx1 = np.array([r["x1"] for r in feats], dtype=np.float64)
    fy1 = np.array([r["y1"] for r in feats], dtype=np.float64)
    nf = len(fid)
    bc = points.sparkSession.sparkContext.broadcast(
        (fid, fx0, fy0, fx1, fy1))

    pk_types = {f.name: f.dataType.simpleString()
                for f in points.schema.fields}
    feat_t = rects.schema["feat_id"].dataType.simpleString()
    out_schema = ", ".join(
        [f"`{c}` {pk_types[c]}" for c in point_keys]
        + [f"`feat_id` {feat_t}", "`d2` bigint", "`rank` int"])
    _np_int = {"int": np.int32, "bigint": np.int64,
               "smallint": np.int16, "tinyint": np.int8}

    def topk(it):
        fid, fx0, fy0, fx1, fy1 = bc.value
        kk = min(k, nf)
        colidx = np.arange(nf, dtype=np.int64)
        # combined (d2, feat_rank) key fits int64 for any d2 the
        # coordinate domain can produce; guarded anyway
        key_cap = (np.iinfo(np.int64).max // max(nf, 1)) - nf
        chunk = max(1, 4_000_000 // max(nf, 1))
        for pdf in it:
            n = len(pdf)
            if n == 0 or nf == 0:
                continue
            pxs = pdf[px].to_numpy(dtype=np.float64)
            pys = pdf[py].to_numpy(dtype=np.float64)
            reps, fsel, d2sel, ranks = [], [], [], []
            # preallocated chunk buffers, all ops in place: these
            # kernels are memory-bandwidth bound at 32 concurrent
            # workers, so every avoided (B x F) temporary is wall time
            dx = np.empty((min(chunk, n), nf))
            dy = np.empty_like(dx)
            tmp = np.empty_like(dx)
            for s in range(0, n, chunk):
                e = min(s + chunk, n)
                b = e - s
                dxv, dyv, tmpv = dx[:b], dy[:b], tmp[:b]
                pc = pxs[s:e, None]
                np.subtract(fx0[None, :], pc, out=dxv)
                np.subtract(pc, fx1[None, :], out=tmpv)
                np.maximum(dxv, tmpv, out=dxv)
                np.maximum(dxv, 0.0, out=dxv)
                pc = pys[s:e, None]
                np.subtract(fy0[None, :], pc, out=dyv)
                np.subtract(pc, fy1[None, :], out=tmpv)
                np.maximum(dyv, tmpv, out=dyv)
                np.maximum(dyv, 0.0, out=dyv)
                np.multiply(dxv, dxv, out=dxv)
                np.multiply(dyv, dyv, out=dyv)
                np.add(dxv, dyv, out=dxv)          # dxv = d2 (float64)
                d2 = dxv.astype(np.int64)
                if d2.max(initial=0) > key_cap:  # never at map scale
                    sel = np.stack([
                        np.lexsort((colidx, row))[:kk] for row in d2])
                    d2s = np.take_along_axis(d2, sel, axis=1)
                else:
                    d2 *= nf                       # in-place combined
                    d2 += colidx[None, :]          # key (d2, feat_rank)
                    if kk < nf:
                        part = np.argpartition(d2, kk - 1,
                                               axis=1)[:, :kk]
                        sel = np.take_along_axis(
                            part, np.argsort(np.take_along_axis(
                                d2, part, axis=1), axis=1), axis=1)
                    else:
                        sel = np.argsort(d2, axis=1)
                    # recover exact d2 from the key: (key - rank)/nf
                    d2s = np.take_along_axis(d2, sel, axis=1)
                    d2s -= sel
                    d2s //= nf
                reps.append(np.repeat(np.arange(s, e), kk))
                fsel.append(sel.ravel())
                d2sel.append(d2s.ravel())
                ranks.append(np.tile(np.arange(1, kk + 1), b))
            rep = np.concatenate(reps)
            res = pdf.iloc[rep][point_keys].reset_index(drop=True)
            res["feat_id"] = fid[np.concatenate(fsel)].astype(
                _np_int.get(feat_t, np.int64))
            res["d2"] = np.concatenate(d2sel)
            res["rank"] = np.concatenate(ranks).astype(np.int32)
            yield res

    return points.select(*point_keys, px, py).mapInPandas(
        topk, out_schema)


def knn_join_pruned(points: DataFrame, rects: DataFrame, k: int = 3,
                    depth: int = 7, ring: int = 3,
                    px: str = "px", py: str = "py",
                    point_keys: list[str] | None = None) -> DataFrame:
    """Scale-path kNN: cell-ring candidate pruning + exact-completeness
    check + brute-force fallback for the (rare) unresolved points.

    Completeness bound (exact, per point): a feature covering NO cell
    within `ring` cells of the point's cell lies entirely outside the
    ring box, hence at distance >= the point's distance to the ring-box
    edge. If the point has >= k ring candidates and its k-th best d2
    <= that bound squared, the ring answer is provably the global
    answer. Everything else (sparse-neighborhood points) falls back to
    the broadcast brute force — results are hash-identical to pure
    brute force, verified at the correctness gate."""
    from ..cells import sql_cell_xy
    from ..config import res_at
    point_keys = point_keys or ["page_id", "cand_i"]
    cs = res_at(depth)
    R = ring * cs  # dilation radius in meters

    # DILATED-FEATURE candidates: expand every feature bbox by R and
    # explode its cover cells ONCE (broadcast side). A point joins on
    # its single cell id, so each (point, feature) pair appears exactly
    # once — no point-side explosion, no dedupe shuffle. Any feature
    # NOT matched has bbox distance > R from the point's whole cell,
    # hence distance > R from the point: constant completeness bound.
    n = (1 << depth) - 1
    rd = (rects
          .withColumn("_ex0", F.col("x0") - R)
          .withColumn("_ey0", F.col("y0") - R)
          .withColumn("_ex1", F.col("x1") + R)
          .withColumn("_ey1", F.col("y1") + R))
    rd = explode_rect_cells(rd, "_ex0", "_ey0", "_ex1", "_ey1", depth)
    rd = (rd.withColumn("cellid",
                        F.col("_cx") * (n + 1) + F.col("_cy"))
          .drop("_cx", "_cy", "cell", "_ex0", "_ey0", "_ex1", "_ey1"))
    cx, cy = sql_cell_xy(px, py, depth)
    p = points.withColumn(
        "cellid", F.expr(f"({cx}) * {n + 1} + ({cy})"))
    cand = p.join(F.broadcast(rd), "cellid")

    w = Window.partitionBy(*point_keys).orderBy("d2", "feat_id")
    wp = Window.partitionBy(*point_keys)
    # ONE shuffle by point key: row_number, then count/max windows over
    # the same partitioning (no extra exchange); persist the tiny top-k
    # so the resolved/fallback branches don't recompute the candidates
    # (bounded per-session LRU — see the cache note above).
    _prune_stopped()
    ranked = (cand.select(*point_keys, "feat_id",
                          _d2(px, py).alias("d2"))
              .withColumn("rank", F.row_number().over(w))
              .where(F.col("rank") <= k)
              .withColumn("_n", F.count(F.lit(1)).over(wp))
              .withColumn("_kth", F.max("d2").over(wp))
              .persist())
    entries = _PERSISTED.setdefault(id(points.sparkSession), [])
    entries.append((points.sparkSession, ranked))
    while len(entries) > _KEEP_PER_SESSION:
        _, old = entries.pop(0)
        old.unpersist(False)
    ok = (F.col("_n") >= k) & (F.col("_kth") <= F.lit(R * R))
    resolved = ranked.where(ok)
    unresolved_pts = points.join(
        resolved.select(*point_keys).distinct(), point_keys, "left_anti")
    fallback = knn_join_rects(unresolved_pts, rects, k, px, py,
                              point_keys)
    return resolved.select(*point_keys, "feat_id", "d2", "rank") \
        .unionByName(fallback.select(*point_keys, "feat_id", "d2",
                                     "rank"))


def knn_candidates_cells(points: DataFrame, rects: DataFrame,
                         depth: int, ring: int = 1,
                         px: str = "px", py: str = "py") -> DataFrame:
    """Cell-pruned candidate pairs: features covering any cell within
    `ring` cells of the point's cell. The scale-path pre-filter: at
    depth d with ring r, a candidate set bounded by local density
    instead of the whole feature table. Exactness requires a fallback
    for points with fewer than k candidates in the ring (caller checks
    counts and escalates ring or falls back to broadcast)."""
    from ..cells import sql_cell_xy, sql_quadkey
    from .spatial_join import explode_rect_cells

    cx, cy = sql_cell_xy(px, py, depth)
    n = (1 << depth) - 1
    # integer cell ids (cx * 2^depth + cy): much cheaper to build and
    # join than 49 quadkey strings per point
    p = (points
         .withColumn("_pcx", F.expr(cx)).withColumn("_pcy", F.expr(cy))
         .withColumn("_dx", F.explode(F.expr(
             f"sequence(-{ring}, {ring})")))
         .withColumn("_dy", F.explode(F.expr(
             f"sequence(-{ring}, {ring})")))
         .withColumn("_ncx", F.expr(
             f"least({n}, greatest(0, _pcx + _dx))"))
         .withColumn("_ncy", F.expr(
             f"least({n}, greatest(0, _pcy + _dy))"))
         # (clamped duplicates at domain edges are deduped below)
         .withColumn("cellid",
                     F.col("_ncx") * (n + 1) + F.col("_ncy")))
    r = explode_rect_cells(rects, "x0", "y0", "x1", "y1", depth)
    r = r.withColumn("cellid",
                     F.col("_cx") * (n + 1) + F.col("_cy")) \
         .drop("_cx", "_cy", "cell")
    pairs = p.join(F.broadcast(r), "cellid")
    keys = [c for c in points.columns]
    return pairs.dropDuplicates(keys + ["feat_id"]) \
        .drop("_pcx", "_pcy", "_dx", "_dy", "_ncx", "_ncy", "cellid")
