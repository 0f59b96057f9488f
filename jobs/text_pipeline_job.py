"""spark-submit entry point for the training-data text pipeline —
the round brief's end-to-end ingest shape composed from the gated
operators: exact dedup (md5 keeper) -> near-dup pruning
(shingle-minhash LSH candidates + exact 3-gram Jaccard >= threshold,
keep the lowest doc_id of each near-dup pair) -> repetition-quality
filter (Gopher-style: drop docs whose duplicate-token fraction
exceeds a cap) -> train/eval decontamination (held-out eval split
excluded from the corpus; training docs sharing >= 3 shingles with it
dropped) -> quality/language stats + classifier score -> PII
redaction -> LM sequence packing positions -> one curated parquet
output.

    python tools/make_pyfiles.py
    spark-submit --master <cluster> --py-files dist/dle.zip \
        jobs/text_pipeline_job.py <docs_dir> <out_dir> \
        [jaccard_threshold_pct] [max_dup_frac_pct] [pack_capacity] \
        [decon_mod]

`decon_mod` (default 11, 0 = off) carves the eval suite out of the
input deterministically (doc_id % decon_mod == 3, the gate's split).

Input: a directory holding `documents.parquet` (doc_id, text, lang —
other engine tables are optional; missing ones are skipped). Output:
parquet of surviving docs with quality_score, clf_score, n_tokens,
lang_pred, text_redacted + per-category PII counts, seq_id,
offset_in_seq — plus a one-line JSON funnel summary on stdout. The
`text` column stays byte-identical to the input (the per-url
invariant); redaction lands in the separate `text_redacted`, and the
classifier score is reported, not thresholded (the cut is deployment
policy).

Every stage is the same code the correctness gate checks
(dle/queries_text.py); this file only composes them.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import SparkSession, functions as F  # noqa: E402


def main():
    if len(sys.argv) < 3:
        sys.exit("usage: text_pipeline_job.py DOCS OUT_DIR"
                 " [jacc_pct] [max_dup_frac_pct] [pack_capacity]"
                 " [decon_mod]")
    docs_path, out_dir = sys.argv[1:3]
    jacc_pct = int(sys.argv[3]) if len(sys.argv) > 3 else 80
    max_dup_pct = int(sys.argv[4]) if len(sys.argv) > 4 else 90
    capacity = int(sys.argv[5]) if len(sys.argv) > 5 else 2048
    decon_mod = int(sys.argv[6]) if len(sys.argv) > 6 else 11

    spark = SparkSession.builder.appName("dle-text-pipeline") \
        .getOrCreate()
    from dle import queries_text as qt

    docs_all = spark.read.parquet(f"{docs_path}/documents.parquet")
    n_in = docs_all.count()

    # 0) carve out the held-out eval suite (never training data)
    if decon_mod > 0:
        eval_docs = docs_all.where(F.expr(
            f"doc_id % {decon_mod} = 3"))
        docs = docs_all.where(F.expr(f"doc_id % {decon_mod} <> 3"))
    else:
        eval_docs, docs = None, docs_all

    # 1) exact dedup: keep the min doc_id per md5(text)
    keep_exact = (docs.groupBy(F.md5("text").alias("m"))
                  .agg(F.min("doc_id").alias("doc_id"))
                  .select("doc_id"))

    # 2) near-dup prune, TRANSITIVELY: verified near-dup pairs (exact
    # 3-gram Jaccard >= threshold on shingle-minhash candidates;
    # integer math: 100*inter >= pct*union) -> connected components ->
    # keep only each group's min doc_id. Pairwise doc_b-dropping
    # under-prunes chains (a~b, b~c keeps a AND would keep c if the
    # (a,c) pair was never a candidate); the component keeper is the
    # production rule.
    from dle.operators.components import connected_components
    jac = qt.q_dedup_ngram_jaccard(spark, docs_path)
    near = jac.where(100 * F.col("n_inter")
                     >= jacc_pct * F.col("n_union"))
    cc = connected_components(near)
    drop = cc.where(F.col("node") != F.col("component")) \
        .select(F.col("node").alias("doc_id"))
    after_near = keep_exact.join(drop, "doc_id", "left_anti")

    # 3) repetition-quality filter (Gopher-style): drop boilerplate/
    # spam docs whose duplicate-token fraction exceeds the cap
    from dle import queries_web as qw
    rep = qw.q_text_repetition(spark, docs_path).select(
        "doc_id", "dup_frac_c")
    too_rep = rep.where(F.col("dup_frac_c") > max_dup_pct) \
        .select("doc_id")
    survivors = after_near.join(too_rep, "doc_id", "left_anti")

    # 3b) train/eval decontamination: drop training docs sharing >= 3
    # distinct 3-gram shingles with any held-out eval doc (broadcast
    # eval index; matched-rows-only exchange). The dedup lineage
    # (exact -> near-dup -> repetition) is persisted ONCE here
    # (ADVICE r5): it feeds the decon probe, the anti-join, the
    # curated join and the funnel counts — unpersisted it would
    # recompute for each; n_decon comes from the cached contaminated
    # frame (every contaminated row is a survivor by construction, so
    # its count IS the number dropped — no before/after count pair).
    survivors = survivors.persist()
    n_decon = 0
    if eval_docs is not None:
        from dle.operators.curation import decontaminate
        contaminated = decontaminate(
            docs.join(F.broadcast(survivors), "doc_id"),
            eval_docs, n=3, min_shared=3).select("doc_id").persist()
        n_decon = contaminated.count()
        pre_decon = survivors
        survivors = survivors.join(contaminated, "doc_id",
                                   "left_anti").persist()
        # release the intermediates (ADVICE r6): the pre-anti-join
        # frame and the contaminated id list are fully consumed once
        # the post-decon survivors frame is materialized below —
        # without this, both stayed cached for the rest of the job
        survivors.count()
        pre_decon.unpersist(False)
        contaminated.unpersist(False)

    # 4) stats on survivors only (re-join by key; text never entered
    # the dedup shuffles beyond hashing — byte-identity discipline)
    stats = qt.q_text_stats(spark, docs_path).select(
        "doc_id", "n_tokens", "quality_score")
    lang = qt.q_text_langid(spark, docs_path).select(
        "doc_id", "lang_pred")
    curated = (docs.join(F.broadcast(survivors), "doc_id")
               .join(stats, "doc_id").join(lang, "doc_id"))

    # 4b) classifier score (reported, not thresholded — the cut is a
    # deployment policy) + PII redaction into a SEPARATE column so
    # `text` stays byte-identical to the input
    from dle.operators.curation import quality_score, redact_pii
    curated = quality_score(curated, score_col="clf_score",
                            ntok_col="clf_n_tokens") \
        .drop("clf_n_tokens")
    curated = redact_pii(curated, out_col="text_redacted")

    # 5) LM packing positions over the curated corpus (two-pass
    # distributed prefix sum — no global single-task window)
    from dle.operators.packing import pack_sequences
    pos = pack_sequences(
        curated.select("doc_id", F.col("n_tokens").alias("n_tok")),
        capacity)
    out = curated.join(pos.select("doc_id", "seq_id", "offset_in_seq"),
                       "doc_id")
    out.write.mode("overwrite").parquet(out_dir)
    survivors.unpersist()

    n_exact = keep_exact.count()
    n_near = after_near.count()
    back = spark.read.parquet(out_dir)
    n_out = back.count()
    n_seqs = (back.agg(F.max("seq_id")).collect()[0][0] or 0) + 1
    pii = back.agg(*(F.sum(c).alias(c) for c in
                     ("n_email", "n_ipv4", "n_phone"))).collect()[0]
    print(json.dumps({
        "docs_in": n_in,
        "eval_suite_docs": 0 if eval_docs is None
        else n_in - docs.count(),
        "after_exact_dedup": n_exact,
        "near_dup_dropped": n_exact - n_near,
        "decontaminated_dropped": n_decon,
        "repetition_dropped": n_near - n_decon - n_out,
        "docs_out": n_out,
        "pii_redacted": {k: int(pii[k] or 0)
                         for k in ("n_email", "n_ipv4", "n_phone")},
        "packed_sequences": int(n_seqs),
        "jaccard_threshold_pct": jacc_pct,
        "max_dup_frac_pct": max_dup_pct,
        "pack_capacity": capacity, "decon_mod": decon_mod,
        "out": out_dir}))


if __name__ == "__main__":
    main()
