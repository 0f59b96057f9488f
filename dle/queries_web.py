"""Web-corpus curation operators over the Common-Crawl-style ``pages``
table and ``documents`` (round brief: "the operations a large-scale
training-data pipeline would need") — host-level rollups, deterministic
train/val/test splits, Gopher-style repetition quality signals,
cross-document duplicated-chunk detection, and tokenizer-vocabulary
top-k. Each has a DuckDB oracle twin.

Cross-engine conventions follow dle/sqlgen.py: md5 is the only string
hash, token = single space split, integer sums before division,
HALF_UP rounding via floor(x + 0.5).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .sqlgen import preamble, register_tables


# ------------------------------------------------------- host rollup

def q_pages_host_rollup(spark, sf):
    """Per-host corpus accounting (the crawl-curation "domain table"):
    page count, distinct languages, total text bytes per host.

    Scale shape: host parse is a scan-side split; the aggregate keys on
    host (cardinality ~= registrable domains, millions at 100 TB) with
    map-side partial aggregation — one bounded shuffle."""
    from . import sqlgen
    pages = sqlgen.spark_view(spark, sf, "pages")
    return (pages
            .select(F.expr("split(url, '/')[2]").alias("host"),
                    "lang", F.length("text").alias("n_chars"))
            .groupBy("host")
            .agg(F.count(F.lit(1)).alias("n_pages"),
                 F.countDistinct("lang").alias("n_langs"),
                 F.sum("n_chars").alias("sum_chars")))


def o_pages_host_rollup():
    return (preamble("duckdb", layers=False) + """
 select string_split(url, '/')[3] as host,
        cast(count(*) as bigint) as n_pages,
        cast(count(distinct lang) as bigint) as n_langs,
        cast(sum(length(text)) as bigint) as sum_chars
 from pages group by 1""")


# ---------------------------------------------- train/val/test split

def q_pages_split_assign(spark, sf):
    """Deterministic hash split of the corpus into train/val/test
    (80/10/10 on the url hash already carried by ``pages``) with
    per-(split, lang) page and char budgets — the reproducible-split
    primitive every training pipeline needs (same url always lands in
    the same split, on any cluster size, with no RNG state).

    Scale shape: pure scan-side arithmetic + a 15-group aggregate."""
    from . import sqlgen
    pages = sqlgen.spark_view(spark, sf, "pages")
    split = F.expr("case when h64 % 10 < 8 then 'train'"
                   " when h64 % 10 = 8 then 'val' else 'test' end")
    return (pages
            .select(split.alias("split"), "lang",
                    F.length("text").alias("n_chars"))
            .groupBy("split", "lang")
            .agg(F.count(F.lit(1)).alias("n_pages"),
                 F.sum("n_chars").alias("sum_chars")))


def o_pages_split_assign():
    return (preamble("duckdb", layers=False) + """
 select case when h64 % 10 < 8 then 'train'
             when h64 % 10 = 8 then 'val' else 'test' end as split,
        lang,
        cast(count(*) as bigint) as n_pages,
        cast(sum(length(text)) as bigint) as sum_chars
 from pages group by 1, 2""")


# ------------------------------------- repetition quality (Gopher-ish)

def _run_fold(arr_expr: str) -> str:
    """Longest equal-run length in a SORTED string array, as a single
    Spark HOF ``aggregate`` fold — the per-doc mode-count (most frequent
    element count) with ZERO shuffle: sort + fold both evaluate inside
    the scan stage.  ``<=>`` is null-safe so the first element
    (prev = null) starts a run of 1."""
    return (f"aggregate(array_sort({arr_expr}),"
            " named_struct('prev', cast(null as string),"
            " 'run', 0, 'best', 0),"
            " (acc, x) -> named_struct("
            "   'prev', x,"
            "   'run', if(acc.prev <=> x, acc.run + 1, 1),"
            "   'best', greatest(acc.best,"
            "           if(acc.prev <=> x, acc.run + 1, 1))),"
            " acc -> cast(acc.best as bigint))")


_BIGRAMS = ("transform(sequence(0, size(split(text, ' ')) - 2),"
            " i -> concat_ws(' ', split(text, ' ')[i],"
            " split(text, ' ')[i + 1]))")


def q_text_repetition(spark, sf):
    """Gopher-style repetition signals per document: token count,
    distinct-token count, duplicate-token fraction (centi-units,
    HALF_UP), most-frequent-token count, most-frequent-bigram count.
    High top_token_n / top_bigram_n relative to n_tokens flags the
    boilerplate/spam pages a curation pipeline drops.

    Scale shape: everything is a scan-side HOF fold over the token
    array (mode-count = longest run in the sorted array) — no explode,
    no shuffle, whole query pipelines in one stage. The oracle computes
    the same numbers relationally (unnest + group by + max(count))."""
    register_tables(spark, sf)
    docs = spark.table("documents").where("size(split(text, ' ')) >= 2")
    n_tok = F.expr("size(split(text, ' '))")
    n_dis = F.expr("size(array_distinct(split(text, ' ')))")
    return docs.select(
        "doc_id",
        n_tok.cast("bigint").alias("n_tokens"),
        n_dis.cast("bigint").alias("n_distinct"),
        # floor(x + .5) = HALF_UP (repo determinism rule)
        F.floor(100.0 * (n_tok - n_dis) / n_tok + F.lit(0.5))
        .cast("bigint").alias("dup_frac_c"),
        F.expr(_run_fold("split(text, ' ')")).alias("top_token_n"),
        F.expr(_run_fold(_BIGRAMS)).alias("top_bigram_n"))


def o_text_repetition():
    return """
 with base as (
   select doc_id, string_split(text, ' ') as ts from documents
   where len(string_split(text, ' ')) >= 2),
 tok as (
   select doc_id, unnest(ts) as tok from base),
 tokc as (
   select doc_id, max(n) as top_token_n from (
     select doc_id, tok, count(*) as n from tok group by 1, 2)
   group by 1),
 big as (
   select b.doc_id, concat(b.ts[i], ' ', b.ts[i + 1]) as bg
   from base b, lateral (
     select unnest(generate_series(1, len(b.ts) - 1)) as i)),
 bigc as (
   select doc_id, max(n) as top_bigram_n from (
     select doc_id, bg, count(*) as n from big group by 1, 2)
   group by 1),
 stats as (
   select doc_id, cast(len(ts) as bigint) as n_tokens,
          cast(len(list_distinct(ts)) as bigint) as n_distinct
   from base)
 select s.doc_id, s.n_tokens, s.n_distinct,
        cast(floor(100.0 * (s.n_tokens - s.n_distinct) / s.n_tokens
                   + 0.5) as bigint) as dup_frac_c,
        cast(t.top_token_n as bigint) as top_token_n,
        cast(g.top_bigram_n as bigint) as top_bigram_n
 from stats s
 join tokc t on t.doc_id = s.doc_id
 join bigc g on g.doc_id = s.doc_id"""


# ------------------------------------------- cross-doc chunk dedup

CHUNK_W = 8  # tokens per chunk (aligned, non-overlapping)


def q_dedup_chunk_shared(spark, sf):
    """Cross-document duplicated-chunk detection (the chunk-granular
    analogue of exact substring dedup in training-data pipelines):
    split every document into aligned 8-token chunks, hash each, and
    report chunks that occur in >= 2 DISTINCT documents — the shared
    boilerplate a pipeline would strip before training.

    Scale shape: chunk build is a scan-side transform (no per-token
    explode — one array op per doc), then explode + hash groupBy with
    map-side partial aggregation; the >= 2-docs filter makes the result
    set the duplicated tail, not the corpus."""
    register_tables(spark, sf)
    chunks = (f"transform(sequence(0, cast(floor((size(split(text, ' '))"
              f" - 1) / {CHUNK_W}) as int)),"
              f" i -> concat_ws(' ', slice(split(text, ' '),"
              f" i * {CHUNK_W} + 1, {CHUNK_W})))")
    return (spark.table("documents")
            .select("doc_id", F.explode(F.expr(chunks)).alias("chunk"))
            .groupBy(F.md5("chunk").alias("chunk_md5"))
            .agg(F.countDistinct("doc_id").alias("n_docs"),
                 F.count(F.lit(1)).alias("n_occurrences"),
                 F.min("doc_id").alias("keeper_doc_id"))
            .where(F.col("n_docs") >= 2))


def o_dedup_chunk_shared():
    w = CHUNK_W
    return f"""
 with base as (
   select doc_id, string_split(text, ' ') as ts from documents),
 chunk as (
   select doc_id,
          array_to_string(ts[i * {w} + 1 : i * {w} + {w}], ' ') as chunk
   from base, lateral (
     select unnest(generate_series(
       0, cast(floor((len(ts) - 1) / {w}) as bigint))) as i))
 select md5(chunk) as chunk_md5,
        cast(count(distinct doc_id) as bigint) as n_docs,
        cast(count(*) as bigint) as n_occurrences,
        min(doc_id) as keeper_doc_id
 from chunk group by 1 having count(distinct doc_id) >= 2"""


# ------------------------------------------------ vocabulary top-k

VOCAB_K = 50


def q_vocab_topk(spark, sf):
    """Global token-vocabulary top-50 by corpus frequency (tokenizer
    training's first pass), deterministic tiebreak (count desc, token
    asc).

    Scale shape: explode + groupBy reduces to vocab cardinality with
    map-side combine; the global top-k then uses orderBy + limit, which
    Spark plans as TakeOrderedAndProject — each partition keeps only
    its local top-50 and the driver merges K*P rows, so the full vocab
    is never shuffled to one task. Ranks attach afterwards on 50 rows."""
    register_tables(spark, sf)
    from pyspark.sql.window import Window
    counts = (spark.table("documents")
              .select(F.explode(F.split("text", " ")).alias("tok"))
              .groupBy("tok").agg(F.count(F.lit(1)).alias("n")))
    top = counts.orderBy(F.desc("n"), F.col("tok")).limit(VOCAB_K)
    w = Window.orderBy(F.desc("n"), F.col("tok"))
    return top.withColumn("rank", F.row_number().over(w)) \
        .select("rank", "tok", "n")


def o_vocab_topk():
    return f"""
 with tok as (
   select unnest(string_split(text, ' ')) as tok from documents),
 counts as (select tok, cast(count(*) as bigint) as n
            from tok group by tok),
 ranked as (
   select tok, n, row_number() over (order by n desc, tok) as rank
   from counts)
 select cast(rank as int) as rank, tok, n
 from ranked where rank <= {VOCAB_K}"""


# ------------------------------------------- top-k pages per host

HOST_K = 3


def q_pages_topk_per_host(spark, sf):
    """Best-pages-per-domain selection (the curation primitive behind
    per-host quotas): keep the top 3 pages per host by text length,
    deterministic tiebreak (n_chars desc, page_id asc).

    Scale shape: one shuffle keyed by host; the window ranks within
    host partitions (host cardinality >> executor count, no skew — a
    single site's page count is bounded by crawl policy)."""
    from pyspark.sql.window import Window
    from . import sqlgen
    pages = sqlgen.spark_view(spark, sf, "pages")
    w = Window.partitionBy("host").orderBy(
        F.desc("n_chars"), F.col("page_id"))
    return (pages
            .select(F.expr("split(url, '/')[2]").alias("host"),
                    "page_id",
                    F.length("text").cast("bigint").alias("n_chars"))
            .withColumn("rank", F.row_number().over(w))
            .where(f"rank <= {HOST_K}"))


def o_pages_topk_per_host():
    return (preamble("duckdb", layers=False) + f"""
 , ranked as (
   select string_split(url, '/')[3] as host, page_id,
          cast(length(text) as bigint) as n_chars,
          row_number() over (partition by string_split(url, '/')[3]
                             order by length(text) desc, page_id)
            as rank
   from pages)
 select host, page_id, n_chars, cast(rank as int) as rank
 from ranked where rank <= {HOST_K}""")


# --------------------------------------------- tile pyramid rollup

PYRAMID_DEPTHS = (2, 4, 6)


def q_spatial_cell_pyramid(spark, sf):
    """Multi-zoom tile pyramid of geocoded page points: point counts
    per quadkey cell at depths 6, 4 and 2 (every tile server's
    aggregation ladder; quadkey prefix = parent tile).

    Scale shape: points aggregate ONCE at the finest depth (map-side
    combined, one point-sized shuffle); coarser levels roll up from the
    depth-6 aggregate — cell-count-sized inputs, not the corpus. The
    prefix explode happens on the aggregate, so adding zoom levels
    costs nothing at the point scan."""
    from . import sqlgen
    from .cells import sql_point_cell
    from .config import DEFAULT_DEPTH
    pts = sqlgen.spark_view(spark, sf, "points")
    cell = sql_point_cell("px", "py", DEFAULT_DEPTH, "spark")
    fine = (pts.select(F.expr(cell).alias("cell6"))
            .groupBy("cell6").agg(F.count(F.lit(1)).alias("n")))
    levels = F.array(*[
        F.struct(F.lit(d).alias("depth"),
                 F.expr(f"substring(cell6, 1, {d})").alias("cell"))
        for d in PYRAMID_DEPTHS])
    return (fine.select(F.explode(levels).alias("l"), "n")
            .groupBy(F.col("l.depth").alias("depth"),
                     F.col("l.cell").alias("cell"))
            .agg(F.sum("n").alias("n_points")))


def o_spatial_cell_pyramid():
    from .cells import sql_point_cell
    from .config import DEFAULT_DEPTH
    cell = sql_point_cell("px", "py", DEFAULT_DEPTH, "duckdb")
    per_depth = " union all ".join(
        f"select cast({d} as int) as depth, substring(cell6, 1, {d})"
        f" as cell, n from fine"
        for d in PYRAMID_DEPTHS)
    return (preamble("duckdb", layers=False) + f"""
 , fine as (
   select {cell} as cell6, cast(count(*) as bigint) as n
   from points group by 1),
 lv as ({per_depth})
 select depth, cell, cast(sum(n) as bigint) as n_points
 from lv group by 1, 2""")


# ------------------------------------------------ sequence packing

PACK_CAPACITY = 64


def q_pack_sequences(spark, sf):
    """LM sequence packing positions for every document (capacity-64
    token sequences, corpus order = doc_id): exclusive prefix sum of
    token counts -> starting sequence id + offset. Engine path is the
    two-pass distributed scan in operators/packing.py (one range
    exchange + Arrow cumsum; NO corpus-wide single-task window — the
    oracle's `over (order by doc_id)` form is exactly the plan shape
    the operator exists to avoid at 10^12 docs)."""
    register_tables(spark, sf)
    from .operators.packing import pack_sequences
    docs = spark.table("documents").select(
        "doc_id", F.expr("size(split(text, ' '))").alias("n_tok"))
    return pack_sequences(docs, PACK_CAPACITY)


def o_pack_sequences():
    return f"""
 with base as (
   select doc_id,
          cast(len(string_split(text, ' ')) as bigint) as n_tok
   from documents),
 cum as (
   select doc_id, n_tok,
          coalesce(sum(n_tok) over (order by doc_id
            rows between unbounded preceding and 1 preceding), 0)
            as cum_prev
   from base)
 select doc_id, n_tok, cast(cum_prev as bigint) as cum_prev,
        cast(floor(cum_prev / {PACK_CAPACITY}) as bigint) as seq_id,
        cast(cum_prev % {PACK_CAPACITY} as bigint) as offset_in_seq
 from cum"""


# ------------------------------------------- URL canonicalization

def q_url_canonical_dedup(spark, sf):
    """URL canonicalization + dedup — the crawl-curation step that
    collapses tracking-parameter/fragment/case variants of one page.
    Variant set is derived deterministically from the pages fixture
    (utm query strings, uppercased URLs, fragments); canonical form =
    lowercase + strip from the first '?' or '#'. (Production rules
    lowercase the HOST only; the fixture's paths are already
    case-insensitive-unique so whole-URL lowercase is equivalent
    here.) Output: canonical url, variant count, keeper page.

    Scale shape: variants and canonicalization are scan-side
    expressions; the only shuffle is the canonical-url groupBy with
    map-side partial aggregation — exactly the exact-dedup shape."""
    from . import sqlgen
    # OPTIMIZATION r7 (guide §5): the four variant branches below each
    # re-executed the md5-heavy generated pages CTE; one lazy
    # localCheckpoint computes it once per invocation.
    pages = sqlgen.spark_view(spark, sf, "pages") \
        .select("page_id", "url", "h64", "hy") \
        .localCheckpoint(eager=False)
    base = pages.select("page_id", F.col("url").alias("vurl"))
    utm = (pages.where("h64 % 3 = 0")
           .select("page_id",
                   F.concat("url", F.lit("?utm_source=feed&id="),
                            F.col("page_id").cast("string"))
                   .alias("vurl")))
    up = (pages.where("h64 % 5 = 0")
          .select("page_id", F.upper("url").alias("vurl")))
    frag = (pages.where("hy % 7 = 0")
            .select("page_id", F.concat("url", F.lit("#section"))
                    .alias("vurl")))
    variants = base.unionByName(utm).unionByName(up).unionByName(frag)
    canon = F.lower(F.regexp_replace("vurl", "[?#].*$", ""))
    return (variants.select("page_id", canon.alias("canonical_url"))
            .groupBy("canonical_url")
            .agg(F.count(F.lit(1)).alias("n_variants"),
                 F.min("page_id").alias("keeper_page_id")))


def o_url_canonical_dedup():
    return (preamble("duckdb", layers=False) + """
 , variants as (
   select page_id, url as vurl from pages
   union all
   select page_id, concat(url, '?utm_source=feed&id=',
                          cast(page_id as string)) from pages
   where h64 % 3 = 0
   union all
   select page_id, upper(url) from pages where h64 % 5 = 0
   union all
   select page_id, concat(url, '#section') from pages where hy % 7 = 0)
 select lower(regexp_replace(vurl, '[?#].*$', '')) as canonical_url,
        cast(count(*) as bigint) as n_variants,
        min(page_id) as keeper_page_id
 from variants group by 1""")


# ------------------------------- exact length quantiles (histogram)

def q_text_length_quantiles(spark, sf):
    """EXACT token-length quantiles per language (p50/p90/p99, rank =
    ceil(q*n)) — the corpus-profiling stat behind length-filter
    thresholds. Computed from a VALUE HISTOGRAM, not a sort: groupBy
    (lang, n_tok) with map-side combine, then a window cumsum over the
    histogram rows. At 100 TB the corpus never sorts and never
    shuffles — only the (langs x distinct lengths)-sized histogram
    does. Exact, deterministic, and cross-engine (integer ranks; no
    approx_percentile, whose sketch is impl-defined)."""
    register_tables(spark, sf)
    from pyspark.sql.window import Window
    d = spark.table("documents").select(
        "lang", F.expr("size(split(text, ' '))").alias("n_tok"))
    h = d.groupBy("lang", "n_tok").agg(F.count(F.lit(1)).alias("c"))
    wc = Window.partitionBy("lang").orderBy("n_tok")
    wn = Window.partitionBy("lang")
    cum = (h.withColumn("cum", F.sum("c").over(wc))
           .withColumn("n", F.sum("c").over(wn)))

    def pick(q):
        rank = F.floor((F.lit(q) * F.col("n") + 99) / 100.0)
        return F.min(F.when(F.col("cum") >= rank, F.col("n_tok"))) \
            .cast("int").alias(f"p{q}")

    return cum.groupBy("lang").agg(
        pick(50), pick(90), pick(99),
        F.min("n").cast("bigint").alias("n_docs"))


def o_text_length_quantiles():
    def pick(q):
        return (f"cast(min(case when cum >= floor(({q} * n + 99)"
                f" / 100.0) then n_tok end) as int) as p{q}")

    return f"""
 with d as (select lang, len(string_split(text, ' ')) as n_tok
            from documents),
 h as (select lang, n_tok, count(*) as c from d group by 1, 2),
 cum as (select lang, n_tok,
                sum(c) over (partition by lang order by n_tok) as cum,
                sum(c) over (partition by lang) as n
         from h)
 select lang, {pick(50)}, {pick(90)}, {pick(99)},
        cast(min(n) as bigint) as n_docs
 from cum group by lang"""


# ------------------------------------------- curation funnel stats

def q_corpus_filter_stats(spark, sf):
    """The curation FUNNEL materialized: exact-dup removal (keeper =
    min doc_id per md5(text)) then length filter (10 <= n_tok <=
    2000), with per-language accounting of kept docs/tokens and drop
    reasons (dup wins over len when both apply). This is the
    composition query a pipeline runs to produce its keep-list and its
    curation report in one pass.

    Scale shape: one shuffle keyed by content hash (uniform — no skew
    by construction) for the keeper window; the lang rollup aggregates
    map-side."""
    register_tables(spark, sf)
    from pyspark.sql.window import Window
    d = spark.table("documents").select(
        "lang", "doc_id", F.md5("text").alias("m"),
        F.expr("size(split(text, ' '))").alias("n_tok"))
    w = Window.partitionBy("m").orderBy("doc_id")
    s = (d.withColumn("rn", F.row_number().over(w))
         .withColumn("st", F.when(F.col("rn") > 1, "dup")
                     .when((F.col("n_tok") < 10)
                           | (F.col("n_tok") > 2000), "len")
                     .otherwise("keep")))

    def cnt(st):
        return F.sum(F.when(F.col("st") == st, 1).otherwise(0)) \
            .cast("bigint")

    return s.groupBy("lang").agg(
        cnt("keep").alias("n_kept"),
        F.sum(F.when(F.col("st") == "keep", F.col("n_tok"))
              .otherwise(0)).cast("bigint").alias("tok_kept"),
        cnt("dup").alias("n_dup_dropped"),
        cnt("len").alias("n_len_dropped"))


def o_corpus_filter_stats():
    return """
 with d as (select lang, doc_id, md5(text) as m,
                   len(string_split(text, ' ')) as n_tok
            from documents),
 r as (select *, row_number() over (partition by m order by doc_id)
              as rn from d),
 s as (select lang, n_tok,
              case when rn > 1 then 'dup'
                   when n_tok < 10 or n_tok > 2000 then 'len'
                   else 'keep' end as st from r)
 select lang,
        cast(sum(case when st = 'keep' then 1 else 0 end) as bigint)
          as n_kept,
        cast(sum(case when st = 'keep' then n_tok else 0 end)
             as bigint) as tok_kept,
        cast(sum(case when st = 'dup' then 1 else 0 end) as bigint)
          as n_dup_dropped,
        cast(sum(case when st = 'len' then 1 else 0 end) as bigint)
          as n_len_dropped
 from s group by lang"""


# ------------------------------------- deterministic stratified sample

# per-language sampling rates in permille (example strata: downsample
# the head language, keep more of the tail)
_SAMPLE_PERMILLE = {"en": 300, "de": 600, "fr": 600}
_SAMPLE_DEFAULT = 900


def q_corpus_sample_stratified(spark, sf):
    """Deterministic STRATIFIED sampling — the reproducible-subset
    primitive every corpus pipeline needs: a doc is kept iff
    md5(doc_id) mod 1000 < rate(lang), so the same document lands in
    the sample on any cluster size, with no RNG state and no
    sampleBy() nondeterminism. Output: per-lang accounting (docs/
    tokens in and sampled) proving each stratum's realized rate.

    Scale shape: pure scan-side hash arithmetic + a per-lang
    aggregate with map-side combine — zero extra shuffles."""
    from .sqlgen import hex2int
    register_tables(spark, sf)
    bucket = F.expr(
        f"{hex2int('cast(doc_id as string)', 'spark')} % 1000")
    rate = F.coalesce(
        *[F.when(F.col("lang") == lg, F.lit(pm))
          for lg, pm in sorted(_SAMPLE_PERMILLE.items())],
        F.lit(_SAMPLE_DEFAULT))
    d = spark.table("documents").select(
        "lang", F.expr("size(split(text, ' '))").alias("n_tok"),
        (bucket < rate).alias("keep"))
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("keep"), 1).otherwise(0)).cast("bigint")
        .alias("n_sampled"),
        F.sum(F.when(F.col("keep"), F.col("n_tok")).otherwise(0))
        .cast("bigint").alias("tok_sampled"))


def o_corpus_sample_stratified():
    from .sqlgen import hex2int
    whens = " ".join(f"when lang = '{lg}' then {pm}"
                     for lg, pm in sorted(_SAMPLE_PERMILLE.items()))
    return f"""
 with d as (
   select lang, len(string_split(text, ' ')) as n_tok,
          ({hex2int("cast(doc_id as string)", "duckdb")}) % 1000
            < (case {whens} else {_SAMPLE_DEFAULT} end) as keep
   from documents)
 select lang, cast(count(*) as bigint) as n_docs,
        cast(sum(case when keep then 1 else 0 end) as bigint)
          as n_sampled,
        cast(sum(case when keep then n_tok else 0 end) as bigint)
          as tok_sampled
 from d group by lang"""


WEB_QUERIES = {
    "pages_host_rollup": (q_pages_host_rollup, o_pages_host_rollup),
    "pages_split_assign": (q_pages_split_assign, o_pages_split_assign),
    "text_repetition": (q_text_repetition, o_text_repetition),
    "dedup_chunk_shared": (q_dedup_chunk_shared, o_dedup_chunk_shared),
    "vocab_topk": (q_vocab_topk, o_vocab_topk),
    "pages_topk_per_host": (q_pages_topk_per_host, o_pages_topk_per_host),
    "spatial_cell_pyramid": (q_spatial_cell_pyramid,
                             o_spatial_cell_pyramid),
    "pack_sequences": (q_pack_sequences, o_pack_sequences),
    "url_canonical_dedup": (q_url_canonical_dedup, o_url_canonical_dedup),
    "text_length_quantiles": (q_text_length_quantiles,
                              o_text_length_quantiles),
    "corpus_filter_stats": (q_corpus_filter_stats, o_corpus_filter_stats),
    "corpus_sample_stratified": (q_corpus_sample_stratified,
                                 o_corpus_sample_stratified),
}
