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


def test_ann_pq_structure_and_codes(spark):
    """PQ top-k: every query returns exactly ANN_K ranked rows with
    monotonically non-increasing ADC scores; encode stays in the
    codebook's code range."""
    from pyspark.sql import functions as F
    from dle import queries_text as qt
    rows = _rows(spark, "ann_pq_topk")
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {0, 1, 2, 3, 4}
    for qid, rs in by_q.items():
        assert sorted(x["rank"] for x in rs) == [1, 2, 3], qid
        adcs = [x["adc_r"] for x in sorted(rs, key=lambda x: x["rank"])]
        assert adcs == sorted(adcs, reverse=True), qid
    # seed vectors encode to their own codeword in every subspace:
    # argmin ||b_c||^2 - 2 b_c . b_c = -||b_c||^2 is minimal at c
    qt.register_tables(spark, SF)
    cb = qt._pq_codebook(spark)
    assert len(cb) == qt.PQ_M and all(len(m) == qt.PQ_C for m in cb)


def test_ann_pq_codeword_exactness(spark):
    """The guaranteed PQ invariant (measured recall on THIS fixture is
    0: random 64-dim vectors carry no cosine signal and 4
    codewords/subspace collapse it entirely — an artifact of the
    fixture, not the operator; near-dup workloads quantize onto their
    clusters): each seed vector encodes to its OWN codeword in every
    subspace, because d(c') = ||b_c'||^2 - 2 b_c . b_c' is strictly
    minimized at c' = c (Cauchy-Schwarz) unless two codewords
    coincide. Verified with the same double arithmetic sequence the
    engine expressions use; Spark/DuckDB parity of those expressions
    is separately gated (check_oracle ann_pq_topk)."""
    from dle import queries_text as qt
    qt.register_tables(spark, SF)
    cb = qt._pq_codebook(spark)
    for m in range(qt.PQ_M):
        for c in range(qt.PQ_C):
            target = cb[m][c]

            def d(cp):
                bb = sum(x * x for x in cb[m][cp])
                dot = 0.0
                for x, y in zip(target, cb[m][cp]):
                    dot = dot + x * y
                return bb - 2 * dot

            ds = [d(cp) for cp in range(qt.PQ_C)]
            assert min(range(qt.PQ_C), key=lambda cp: (ds[cp], cp)) \
                == c, (m, c, ds)


def _plan(df) -> str:
    return df.sparkSession._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def test_ann_topk_exchange_is_k_bounded(spark):
    """OPTIMIZATION r7 (VERDICT r6 #2): the brute/PQ ANN rankings must
    NOT shuffle the full corpus x nq score table into nq partitions.
    On Spark 4 the rank-limit pushdown plans a PARTIAL WindowGroupLimit
    BELOW the window's Exchange, so each map task ships at most K rows
    per query — this pins that shape (a regression to an unbounded
    exchange drops the pre-exchange WindowGroupLimit). In
    explain('formatted') parents print before children, so the tree
    order must be Window ... Exchange ... WindowGroupLimit, and the
    details section must show a Partial-mode row_number limit."""
    for name in ("ann_cosine_topk", "ann_pq_topk"):
        df = q.queries()[name](spark, SF)
        full = _plan(df)
        plan = full.split("\n\n")[0]  # the numbered tree section
        iw = plan.index("Window ")
        ix = plan.index("Exchange ", iw)
        ig = plan.index("WindowGroupLimit ", ix)
        assert iw < ix < ig, (name, iw, ix, ig)
        assert "row_number(), 3, Partial" in full, name
