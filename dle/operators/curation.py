"""Corpus-curation operators: train/eval decontamination and PII
redaction — the two standard web-text pipeline steps (C4/CCNet-style)
the engine did not yet expose as first-class operators.

Scale shapes (the 100-TB story):

* ``decontaminate`` — the benchmark/eval side is KB-MB scale in
  production (a few thousand eval documents), so its shingle inverted
  index is BROADCAST; the corpus side computes shingles in-scan
  (array HOF + in-task explode, no shuffle) and the broadcast hash
  join drops every non-matching shingle map-side.  The only exchange
  carries MATCHED (doc, bench, shingle) rows — bounded by actual
  contamination volume, not corpus size.  No O(corpus x bench) pair
  enumeration ever exists.
* ``redact_pii`` — pure scan-side `regexp_replace`/`regexp_extract_all`
  column expressions (JVM, whole-stage codegen, zero shuffle, zero
  Python).  At 100 TB this is exactly a map-only pass over the scan.

Reference parity note: the reference pipeline has no text curation
surface (it is a spatial overlay engine); these extend the graft's
LLM-data-pipeline operator family (SURVEY.md "beyond the reference").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Word n-gram shingle array (distinct) as a SQL HOF expression — the
# shingle set is computed inside the scan stage (no explode until the
# candidate join needs rows).  n=3 matches the near-dup family
# (queries_text._SHINGLES) so decontamination and dedup agree on what
# "shared text" means.
def shingle_expr(n: int = 3, text_col: str = "text") -> str:
    toks = f"split({text_col}, ' ')"
    parts = ", ".join(f"{toks}[i + {j}]" for j in range(n))
    # self-guarding: Spark's sequence(0, -1) DESCENDS to [0, -1]
    # (it never returns empty), so a < n-token doc would index out of
    # bounds under ANSI mode without the size gate
    return (f"if(size({toks}) < {n}, array(),"
            f" array_distinct(transform(sequence(0, size({toks}) - {n}),"
            f" i -> concat_ws(' ', {parts}))))")


def decontaminate(corpus: DataFrame, bench: DataFrame, *, n: int = 3,
                  min_shared: int = 3, id_col: str = "doc_id",
                  bench_id_col: str = "bench_id",
                  text_col: str = "text") -> DataFrame:
    """Flag corpus documents sharing >= ``min_shared`` distinct word
    ``n``-gram shingles with any benchmark document.

    Returns one row per contaminated corpus doc:
      (id_col, n_bench, max_shared, sum_shared)
    where ``n_bench`` counts benchmark docs over the threshold,
    ``max_shared`` is the largest distinct-shingle overlap with a
    single benchmark doc, ``sum_shared`` the total across them.

    The caller supplies the two sides (e.g. train split vs eval
    split); docs shorter than ``n`` tokens cannot share an n-gram and
    are dropped on both sides.  ``bench`` must be small enough to
    broadcast (production eval suites are — assert on row count if in
    doubt); corpus-side work is one scan + matched-rows-only shuffle.
    """
    sh = shingle_expr(n, text_col)
    guard = f"size(split({text_col}, ' ')) >= {n}"

    def rows(df: DataFrame, out_id: str) -> DataFrame:
        return (df.where(F.expr(guard))
                  .select(F.col(id_col).alias(out_id),
                          F.explode(F.expr(sh)).alias("_sh")))

    ov = (rows(corpus, id_col)
          .join(F.broadcast(rows(bench, bench_id_col)), "_sh")
          .groupBy(id_col, bench_id_col)
          .agg(F.count("*").alias("shared"))
          .where(F.col("shared") >= min_shared))
    return ov.groupBy(id_col).agg(
        F.count("*").alias("n_bench"),
        F.max("shared").alias("max_shared"),
        F.sum("shared").alias("sum_shared"))


# PII patterns — written to the RE2-compatible subset (no lookaround,
# no backreferences) so Spark (java.util.regex) and DuckDB (RE2)
# match identically; replacement order is email -> ipv4 -> phone so
# the later patterns never see an address's local part or dots.
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}-\d{4}\b", "<PHONE>"),
]


def redact_pii(df: DataFrame, text_col: str = "text",
               out_col: str = "redacted") -> DataFrame:
    """Mask emails / IPv4 addresses / short phone numbers in
    ``text_col`` and count each category per row.

    Adds columns ``n_email, n_ipv4, n_phone`` (match counts on the
    ORIGINAL text) and ``out_col`` (the masked text).  All JVM
    scan-side expressions — zero shuffle, zero Python.
    """
    out = df
    red = F.col(text_col)
    for name, pat, repl in PII_PATTERNS:
        # python-API forms take the pattern as a plain string/Column —
        # no SQL-literal backslash escaping to get wrong; idx=0 (whole
        # match) because Spark's default idx=1 throws on group-free
        # patterns
        out = out.withColumn(
            f"n_{name}",
            F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat),
                                        F.lit(0))))
        red = F.regexp_replace(red, pat, repl)
    return out.withColumn(out_col, red)
