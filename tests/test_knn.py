"""Spatial kNN operator (north_star op)."""

from __future__ import annotations

from dle import queries as q
from dle import sqlgen
from dle.operators.knn import knn_candidates_cells, knn_join_rects

SF = "/root/testdata/sf0.001"


def test_knn_ranks_are_dense_and_distance_sorted(spark):
    out = q.q_spatial_knn(spark, SF).collect()
    by_pt = {}
    for r in out:
        by_pt.setdefault((r["page_id"], r["cand_i"]), []).append(
            (r["rank"], r["d2"], r["feat_id"]))
    assert by_pt
    for pt, rows in by_pt.items():
        rows.sort()
        assert [r[0] for r in rows] == list(range(1, len(rows) + 1))
        d2s = [r[1] for r in rows]
        assert d2s == sorted(d2s), pt


def test_knn_pruned_releases_persisted_topk(spark):
    """VERDICT r2 #8: repeated knn_join_pruned calls must not
    accumulate persisted storage — bounded at _KEEP_PER_SESSION
    frames, and release_cache() empties it. Robustness note: other
    tests' localCheckpoint RDDs are cleaned ASYNCHRONOUSLY by Spark's
    ContextCleaner once their Python handles are gc'd, so the global
    persistent-RDD count can only be asserted as an upper bound — it
    may legitimately DROP mid-test (observed flake in the full
    suite)."""
    import gc

    from dle.operators import knn

    def n_persisted():
        return spark.sparkContext._jsc.getPersistentRDDs().size()

    knn.release_cache()
    gc.collect()  # flush pending ContextCleaner work from prior tests
    spark.sparkContext._jvm.System.gc()
    base = n_persisted()
    for _ in range(knn._KEEP_PER_SESSION + 2):
        q.q_spatial_knn_pruned(spark, SF).count()
        assert n_persisted() <= base + knn._KEEP_PER_SESSION
    knn.release_cache()
    assert n_persisted() <= base


def test_knn_pruned_interleaved_calls_stay_persisted(spark):
    """VERDICT r4 #8 (single-outstanding-result contract retired): a
    second knn_join_pruned call must NOT release the first call's
    still-unconsumed top-k frame — both stay persisted (up to the LRU
    bound) and both results are correct when finally consumed."""
    from dle.operators import knn
    from dle.operators.knn import knn_join_pruned

    knn.release_cache()
    pts = sqlgen.spark_view(spark, SF, "points").select(
        "page_id", "cand_i", "px", "py")
    lay = sqlgen.spark_view(spark, SF, "layers")
    a = knn_join_pruned(pts, lay, k=3)
    b = knn_join_pruned(pts.where("cand_i = 0"), lay, k=2)
    entries = knn._PERSISTED[id(spark)]
    assert len(entries) == 2
    # issuing b did not unpersist a's frame
    assert all(df.storageLevel.useMemory for _, df in entries)
    # both consume correctly AFTER interleaving
    brute = {(r["page_id"], r["cand_i"], r["rank"]): r["feat_id"]
             for r in knn_join_rects(pts, lay, k=3).collect()}
    for r in a.collect():
        assert brute[(r["page_id"], r["cand_i"], r["rank"])] \
            == r["feat_id"]
    got_b = {(r["page_id"], r["cand_i"], r["rank"]): r["feat_id"]
             for r in b.collect()}
    for key, fid in got_b.items():
        assert brute[key] == fid
    knn.release_cache(spark)
    assert id(spark) not in knn._PERSISTED


def test_cell_candidates_superset_of_local_topk(spark):
    """Scale-path pre-filter: if a point's true nearest neighbor lies
    within the cell ring, it must be in the candidate set."""
    pts = sqlgen.spark_view(spark, SF, "points").select(
        "page_id", "cand_i", "px", "py")
    lay = sqlgen.spark_view(spark, SF, "layers")
    true1 = {(r["page_id"], r["cand_i"]): (r["feat_id"], r["d2"])
             for r in knn_join_rects(pts, lay, k=1).collect()}
    cand = knn_candidates_cells(pts, lay, depth=3, ring=1)
    cand_set = {(r["page_id"], r["cand_i"], r["feat_id"])
                for r in cand.select("page_id", "cand_i",
                                     "feat_id").collect()}
    from dle.config import res_at
    ring_reach = res_at(3) ** 2  # anything nearer than one cell side
    checked = 0
    for (pid, ci), (fid, d2) in true1.items():
        if d2 < ring_reach:
            assert (pid, ci, fid) in cand_set, (pid, ci, fid, d2)
            checked += 1
    assert checked > 0
