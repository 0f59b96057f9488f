"""spark-submit entry point for the training-data text pipeline —
the round brief's end-to-end ingest shape composed from the gated
operators: exact dedup (md5 keeper) -> near-dup pruning
(shingle-minhash LSH candidates + exact 3-gram Jaccard >= threshold,
keep the lowest doc_id of each near-dup pair) -> repetition-quality
filter (Gopher-style: drop docs whose duplicate-token fraction
exceeds a cap) -> quality/language stats -> LM sequence packing
positions -> one curated parquet output.

    python tools/make_pyfiles.py
    spark-submit --master <cluster> --py-files dist/dle.zip \
        jobs/text_pipeline_job.py <docs_dir> <out_dir> \
        [jaccard_threshold_pct] [max_dup_frac_pct] [pack_capacity]

Input: a directory holding `documents.parquet` (doc_id, text, lang —
other engine tables are optional; missing ones are skipped). Output:
parquet of surviving docs with quality_score, n_tokens, lang_pred,
seq_id, offset_in_seq — plus a one-line JSON funnel summary on stdout.

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
                 " [jacc_pct] [max_dup_frac_pct] [pack_capacity]")
    docs_path, out_dir = sys.argv[1:3]
    jacc_pct = int(sys.argv[3]) if len(sys.argv) > 3 else 80
    max_dup_pct = int(sys.argv[4]) if len(sys.argv) > 4 else 90
    capacity = int(sys.argv[5]) if len(sys.argv) > 5 else 2048

    spark = SparkSession.builder.appName("dle-text-pipeline") \
        .getOrCreate()
    from dle import queries_text as qt

    docs = spark.read.parquet(f"{docs_path}/documents.parquet")
    n_in = docs.count()

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

    # 4) stats on survivors only (re-join by key; text never entered
    # the dedup shuffles beyond hashing — byte-identity discipline)
    stats = qt.q_text_stats(spark, docs_path).select(
        "doc_id", "n_tokens", "quality_score")
    lang = qt.q_text_langid(spark, docs_path).select(
        "doc_id", "lang_pred")
    curated = (docs.join(F.broadcast(survivors), "doc_id")
               .join(stats, "doc_id").join(lang, "doc_id"))

    # 5) LM packing positions over the curated corpus (two-pass
    # distributed prefix sum — no global single-task window)
    from dle.operators.packing import pack_sequences
    pos = pack_sequences(
        curated.select("doc_id", F.col("n_tokens").alias("n_tok")),
        capacity)
    out = curated.join(pos.select("doc_id", "seq_id", "offset_in_seq"),
                       "doc_id")
    out.write.mode("overwrite").parquet(out_dir)

    n_exact = keep_exact.count()
    n_near = after_near.count()
    n_out = spark.read.parquet(out_dir).count()
    n_seqs = (spark.read.parquet(out_dir)
              .agg(F.max("seq_id")).collect()[0][0] or 0) + 1
    print(json.dumps({
        "docs_in": n_in, "after_exact_dedup": n_exact,
        "near_dup_dropped": n_exact - n_near,
        "repetition_dropped": n_near - n_out, "docs_out": n_out,
        "packed_sequences": int(n_seqs),
        "jaccard_threshold_pct": jacc_pct,
        "max_dup_frac_pct": max_dup_pct,
        "pack_capacity": capacity, "out": out_dir}))


if __name__ == "__main__":
    main()
