"""Web/URL operators for a crawl-shaped corpus: URL normalization and
host-level aggregation (domain quality statistics drive per-domain
sampling decisions in corpus curation).

All JVM built-ins; every output value is DuckDB-expressible for the
oracle (regexp host extraction mirrors parse_url)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import quality_exprs


def with_url(docs: DataFrame) -> DataFrame:
    """Attach the deterministic crawl url (mirrors datagen.pages.url_for
    so the pages table and documents agree)."""
    return docs.withColumn(
        "url",
        F.format_string("https://site%d.example/%d",
                        F.pmod("doc_id", F.lit(97)), F.col("doc_id")))


def normalize_url(url_col):
    """Canonical form: lowercase scheme+host, strip fragment, strip
    common tracking params (utm_*), drop trailing slash on paths."""
    u = F.regexp_replace(url_col, r"#.*$", "")                 # fragment
    u = F.regexp_replace(u, r"([?&])utm_[^&]*", r"$1")         # utm params
    u = F.regexp_replace(u, r"[?&]+$", "")                     # empty query
    u = F.regexp_replace(u, r"\?&+", "?")
    scheme_host = F.lower(F.regexp_extract(u, r"^([a-zA-Z]+://[^/]+)", 1))
    rest = F.regexp_replace(u, r"^[a-zA-Z]+://[^/]+", "")
    rest = F.regexp_replace(rest, r"/$", "")
    return F.concat(scheme_host, rest)


def host_of(url_col):
    return F.parse_url(url_col, F.lit("HOST"))


def host_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-host corpus statistics: doc count, token budget, mean quality
    score — one projection + one map-side-combined aggregation (the
    shuffle carries one partial row per (partition, host))."""
    qx = quality_exprs(F.col(text_col))
    per_doc = with_url(docs).select(
        host_of(F.col("url")).alias("host"),
        qx["n_tokens"].alias("n_tokens"),
        qx["quality_score"].alias("q"))
    # decimal-exact sum, then ONE double division: a float avg of 6-dp
    # values can land exactly on a rounding boundary, where the two
    # engines' summation orders disagree on the last digit
    return (per_doc.groupBy("host")
            .agg(F.count("*").alias("n_docs"),
                 F.sum(F.col("n_tokens").cast("long")).alias("sum_tokens"),
                 F.round(F.sum(F.col("q").cast("decimal(18,6)"))
                         .cast("double") / F.count("*"), 6)
                 .alias("avg_quality")))


def latest_captures(pages: DataFrame, url_col: str = "url",
                    ts_col: str = "warc_ts",
                    id_col: str = "doc_id") -> DataFrame:
    """Recrawl dedup: Common Crawl captures the same url across monthly
    snapshots — keep only the NEWEST capture per url (tie: lowest
    ``id_col``). This runs before content dedup in a crawl pipeline so
    historical recrawls never inflate the corpus.

    Plan shape for 100 TB: ONE ``max(struct(ts, -id))`` aggregation —
    map-side combinable, so the shuffle carries one partial row per
    (task, url), never the capture history; deliberately not a per-url
    window (a hot url with millions of captures would sort inside one
    partition). Column payload is (url, ts, id) — page bytes never ride
    the shuffle; re-attach the kept capture's content by joining back
    on (url, id)."""
    best = F.max(F.struct(F.col(ts_col).alias("ts"),
                          (-F.col(id_col)).alias("neg_id")))
    return (pages.groupBy(url_col)
            .agg(F.count("*").alias("n_captures"), best.alias("b"))
            .select(url_col,
                    (-F.col("b.neg_id")).cast("long").alias(id_col),
                    F.col("b.ts").alias(ts_col),
                    F.col("n_captures").cast("long").alias("n_captures")))


def host_cap(docs: DataFrame, k: int = 3,
             text_col: str = "text") -> DataFrame:
    """FineWeb-style per-domain cap: keep at most the ``k`` best-quality
    documents per host (domain balancing — without it a handful of
    template-heavy hosts dominate a crawl-scale corpus).

    Two-stage top-k (same shape as similarity._rank_topk): a
    partition-LOCAL head(k)-per-host inside mapInPandas first — no
    exchange, each input partition emits <= k rows per host — then the
    per-host rank window runs over at most partitions x k rows per
    host. A single global window would instead ship EVERY page of a
    hot host into one sorted reducer partition. The (quality desc,
    doc_id asc) total order is deterministic (quality is 6-dp rounded,
    ties break on doc_id), and the global top-k is always a subset of
    the union of partition-local top-ks, so the two stages are exact."""
    from pyspark.sql.window import Window

    qx = quality_exprs(F.col(text_col))
    per = with_url(docs).select(
        host_of(F.col("url")).alias("host"), "doc_id",
        qx["quality_score"].alias("q"))

    def partial(batches):
        import pandas as pd

        def compress(frames):
            cur = pd.concat(frames, ignore_index=True)
            return (cur.sort_values(["host", "q", "doc_id"],
                                    ascending=[True, False, True])
                    .groupby("host", sort=False).head(k))

        # accumulate raw batches and sort ONCE at the end (r4 verdict
        # item 7: the old per-batch concat+resort paid O(B * acc log
        # acc)); the rows are 3 narrow scalars so a partition's worth
        # fits comfortably, with a 1M-row compaction valve so a
        # pathological partition stays bounded at H*k + 1M rows
        acc: list = []
        n = 0
        for pdf in batches:
            acc.append(pdf)
            n += len(pdf)
            if n > 1_000_000:
                acc = [compress(acc)]
                n = len(acc[0])
        if acc:
            best = compress(acc)
            if len(best):
                yield best

    part = per.mapInPandas(partial, "host string, doc_id long, q double")
    w = Window.partitionBy("host").orderBy(F.desc("q"), F.asc("doc_id"))
    return (part.withColumn("host_rank", F.row_number().over(w))
            .where(F.col("host_rank") <= k)
            .select("host", "doc_id",
                    F.col("q").alias("quality_score"), "host_rank"))


# -- URL filtering (FineWeb/Dolma-style curation stage) ----------------------

# Committed, deterministic rule tables (a production pipeline swaps in
# the published UT1/adult blocklists as a broadcast-joined table; the
# RULES here keep the operator self-contained and testable):
BLOCKED_HOST_SUFFIXES = [
    ".invalid", ".test", ".localhost",
]
BLOCKED_HOST_KEYWORDS = [
    "tracker", "clickbait", "linkfarm",
]
NON_CONTENT_EXTENSIONS = [
    "jpg", "jpeg", "png", "gif", "webp", "svg", "ico",
    "css", "js", "woff", "woff2", "ttf",
    "zip", "tar", "gz", "exe", "dmg", "iso",
    "mp3", "mp4", "avi", "mov",
]
MAX_URL_LEN = 2048
MAX_QUERY_PARAMS = 8


def url_filter_exprs(url_col) -> dict[str, "F.Column"]:
    """Per-url boolean rule expressions (pure projections — compose
    into one select). True = the rule FIRES (url should be dropped).

    The rules mirror what FineWeb/Dolma/CCNet apply before any content
    work: blocklisted hosts, non-content file extensions, oversized or
    parameter-stuffed URLs (spam/calendar traps). Running them FIRST
    is the cheapest filter in the whole pipeline — at 10^12 docs every
    later stage pays per surviving row, and these rules read only the
    url column (column pruning: the scan never materializes html/text
    for dropped rows' predicates)."""
    host = F.lower(F.coalesce(host_of(url_col), F.lit("")))
    path = F.coalesce(F.parse_url(url_col, F.lit("PATH")), F.lit(""))
    query = F.coalesce(F.parse_url(url_col, F.lit("QUERY")), F.lit(""))
    blocked_host = F.lit(False)
    for suf in BLOCKED_HOST_SUFFIXES:
        blocked_host = blocked_host | host.endswith(suf)
    for kw in BLOCKED_HOST_KEYWORDS:
        blocked_host = blocked_host | host.contains(kw)
    ext = F.lower(F.regexp_extract(path, r"\.([A-Za-z0-9]{1,5})$", 1))
    non_content = ext.isin(NON_CONTENT_EXTENSIONS)
    too_long = F.length(url_col) > MAX_URL_LEN
    # n params = n '=' separated segments in the query string
    n_params = F.when(query == "", F.lit(0)).otherwise(
        F.size(F.split(query, "&")))
    trap = n_params > MAX_QUERY_PARAMS
    return {"blocked_host": blocked_host, "non_content": non_content,
            "too_long": too_long, "param_trap": trap}


def url_filter(docs: DataFrame, url_col: str = "url",
               keep_only: bool = True) -> DataFrame:
    """FineWeb-style URL filtering: drop documents whose url hits any
    rule in ``url_filter_exprs``. ``keep_only=False`` returns every row
    with the per-rule booleans and a ``url_ok`` verdict instead of
    filtering (the audit view: count rule hits per crawl).

    Zero shuffles either way; with ``keep_only=True`` the predicate
    sits directly on the scan."""
    df = docs if url_col in docs.columns else with_url(docs)
    rules = url_filter_exprs(F.col(url_col))
    ok = ~rules["blocked_host"] & ~rules["non_content"] \
        & ~rules["too_long"] & ~rules["param_trap"]
    if keep_only:
        return df.where(ok)
    out = df.select("*", *[c.alias(n) for n, c in rules.items()])
    return out.withColumn("url_ok", ok)


# -- page directives (robots meta / canonical link) --------------------------

def page_directives(pages: DataFrame, html_col: str = "html",
                    url_col: str = "url",
                    id_col: str | None = None) -> DataFrame:
    """Per-page crawl directives straight off the raw bytes:
    ``noindex``/``nofollow`` from ``<meta name="robots">`` and the
    ``rel="canonical"`` link target. A crawl pipeline drops noindex
    pages and collapses canonical families (mirror/AMP/print variants
    all declaring one canonical) BEFORE any content work — together
    with url_filter these are the cheapest drop rules in the stack.

    Pure projection over the scan (regexp on a lossy-decoded prefix of
    the bytes — directives live in <head>, so only the first 8 KB are
    inspected; the full html column never leaves the JVM). Attribute
    order is handled by matching either (name=..content=..) order;
    HTML entity/e.g. case variance by lowercasing first."""
    head = F.coalesce(F.lower(F.decode(
        F.substring(F.col(html_col), 1, 8192), "UTF-8")), F.lit(""))
    robots = F.regexp_extract(
        head,
        r'<meta[^>]*name\s*=\s*["\']robots["\'][^>]*'
        r'content\s*=\s*["\']([^"\']*)["\']', 1)
    robots2 = F.regexp_extract(
        head,
        r'<meta[^>]*content\s*=\s*["\']([^"\']*)["\'][^>]*'
        r'name\s*=\s*["\']robots["\']', 1)
    directives = F.when(robots != "", robots).otherwise(robots2)
    canonical = F.regexp_extract(
        head,
        r'<link[^>]*rel\s*=\s*["\']canonical["\'][^>]*'
        r'href\s*=\s*["\']([^"\']+)["\']', 1)
    canonical2 = F.regexp_extract(
        head,
        r'<link[^>]*href\s*=\s*["\']([^"\']+)["\'][^>]*'
        r'rel\s*=\s*["\']canonical["\']', 1)
    canon = F.when(canonical != "", canonical).otherwise(canonical2)
    return pages.select(
        *([id_col] if id_col else []),
        url_col,
        directives.contains("noindex").alias("noindex"),
        directives.contains("nofollow").alias("nofollow"),
        F.when(canon != "", canon).alias("canonical_url"),
    )


def collapse_canonical(pages: DataFrame, html_col: str = "html",
                       url_col: str = "url", ts_col: str = "warc_ts",
                       id_col: str = "doc_id") -> DataFrame:
    """Canonical-family collapse: mirror/AMP/print variants that all
    declare one ``rel=canonical`` target collapse to a single kept
    capture per family — the family key is the declared canonical (the
    page's own url when it declares none), and within a family the
    newest capture wins (ties: lowest ``id_col``), exactly the
    latest_captures rule.

    Composition of the two tested pieces: page_directives (pure
    projection, keyed by ``id_col`` — keying by url would multiply
    rows for a url with several captures and let one capture inherit a
    sibling's directives) -> latest_captures' combinable max-struct
    aggregation on the family key. One narrow shuffle of
    (family, ts, id) rows; page bytes never move. noindex pages are
    dropped before grouping (a noindex variant must not win its family
    and censor an indexable sibling)."""
    d = page_directives(pages, html_col, url_col, id_col=id_col) \
        .select(id_col, "noindex", "canonical_url")
    keyed = (pages.select(url_col, ts_col, id_col)
             .join(d, id_col)
             .where(~F.col("noindex"))
             .select(F.coalesce("canonical_url", F.col(url_col))
                     .alias("family"), ts_col, id_col))
    best = F.max(F.struct(F.col(ts_col).alias("ts"),
                          (-F.col(id_col)).alias("neg_id")))
    return (keyed.groupBy("family")
            .agg(F.count("*").alias("n_variants"), best.alias("b"))
            .select("family",
                    (-F.col("b.neg_id")).cast("long").alias(id_col),
                    F.col("b.ts").alias(ts_col),
                    F.col("n_variants").cast("long").alias("n_variants")))


def host_suffixes(host_col):
    """All registrable suffixes of a host: 'a.b.example.com' ->
    ['a.b.example.com', 'b.example.com', 'example.com', 'com'] — an
    expression-level explode key so suffix blocking becomes an
    EQUI-join (suffix match is not joinable directly)."""
    parts = F.split(host_col, r"\.")
    n = F.size(parts)
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.array_join(F.slice(parts, i, n), "."))


def url_filter_hosts(docs: DataFrame, blocked_hosts: DataFrame,
                     url_col: str = "url") -> DataFrame:
    """URL blocking against a blocklist TABLE (the UT1/adult-list scale
    path — the literal rules in url_filter_exprs cover self-contained
    heuristics, but a production blocklist is millions of domains and
    ships as data): a doc is dropped when ANY suffix of its url host
    appears in ``blocked_hosts(host string)`` — so blocking
    'example.com' also blocks 'ads.example.com'.

    Spark shape: explode each url's O(labels) suffixes into an
    equi-key, broadcast-hash-join the blocklist to find the HIT docs,
    then broadcast the hit-list back for a left-anti reassembly — zero
    corpus shuffles while the hits stay broadcast-sized (they are the
    blocked fraction, typically a few %). If the hit-list outgrows the
    broadcast threshold, drop that hint and AQE falls back to one
    corpus exchange on doc_id — the unavoidable regroup."""
    df = docs if url_col in docs.columns else with_url(docs)
    keyed = df.withColumn("_host", F.lower(
        F.coalesce(host_of(F.col(url_col)), F.lit(""))))
    pairs = keyed.select(
        "doc_id", F.explode(host_suffixes(F.col("_host"))).alias("_sfx"))
    blocked = (pairs.join(
        F.broadcast(blocked_hosts.select(
            F.lower("host").alias("_sfx")).distinct()), "_sfx")
        .select("doc_id").distinct())
    return keyed.join(F.broadcast(blocked), "doc_id",
                      "left_anti").drop("_host")
