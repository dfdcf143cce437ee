"""URL acquisition operators: canonicalization, domain rollups, robots
filtering, and a politeness-capped crawl frontier — the URL-level half
of a web-scale corpus acquisition stage (the reference starts from
already-fetched documents; this is the layer that decides WHAT gets
fetched and which fetches are the same page).

As with `webextract`, the corpus tables carry no URLs, so each operator
first synthesises a deterministic RAW url per document — host a
pure function of the page id (doc_id div 2), so consecutive doc pairs
are two raw observations of the SAME page — (four mess
classes by doc_id % 4: uppercase scheme/host, explicit default ports,
``www.`` prefixes, ``/./`` and ``/../`` dot segments, percent-encoded
unreserved characters, tracking parameters, unsorted query strings,
fragments) entirely inside the query, then normalizes it back out:

* ``url_normalize`` — RFC 3986 §6 syntax-based normalization (lowercase
  scheme+host, strip default ports, resolve dot segments, decode
  percent-encoded unreserved chars, drop fragments) PLUS the crawl
  conventions every URL-dedup pipeline layers on top (strip a leading
  ``www.``, drop ``utm_*`` tracking params, sort the remaining query
  params). Consecutive doc pairs share a page id, so normalization
  provably MERGES raw variants: the gate hashes the canonical form and
  an in-query idempotence proof (canon(canon) = canon).
* ``domain_stats`` — registered-domain rollup: pages, hosts, canonical
  URLs, and the duplicate-fetch rate URL dedup would save.
* ``robots_filter`` — per-domain disallow prefixes (synthesised from
  the domain hash), broadcast onto the URL table; per-URL allow
  verdict + the matching rule.
* ``crawl_frontier`` — the scheduler step: unseen, robots-allowed
  canonical URLs, hash-prioritized (deterministic randomization — the
  standard guard against crawler traps / adversarial link farms),
  capped at FRONTIER_K per domain (politeness) with the same
  broadcast-sizes + hash-prefilter discipline as stratified_sample so
  no mega-domain ever concentrates a window partition.

Dot-segment resolution applies a FIXED number of rewrite passes (2),
which resolves any interleaving of at most two ``.``/``..`` segments —
the synthesised mess has at most one of each; a production crawler
fronting arbitrary paths would loop to fixpoint (bounded by path
depth). Documented rather than hidden.

100 TB story: url_normalize is a zero-shuffle expression pipeline over
a pruned (doc_id, source, lang) scan; domain_stats is one
map-side-combined groupBy on the uniform registered-domain key (Spark
plans the distinct aggregates as expand + two-stage partial aggs — no
hot-key window); robots_filter broadcasts the domain-rule table (one
row per domain with rules, tiny after the distinct); crawl_frontier's
only window runs on the hash-prefiltered candidate set (~K x safety
rows per domain). URLs cross exchanges as canonical strings once;
no Python anywhere.

Reference analog: none — SURVEY.md §2.8 training-data extension
surface. Normalization semantics follow RFC 3986 §6.2.2 plus the
public crawl conventions (e.g. the SURT canonical form CommonCrawl
indexes by).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import constants as C, read_spread
from .textstats import _h30_duck, _h30_spark, _spark_re

FRONTIER_K = 5       # politeness: max URLs per domain per frontier batch
FRONTIER_SAFETY = 8  # hash-prefilter over-selection factor
SEEN_MOD = 3         # doc_id % 3 == 0 pages are already crawled

# robots: every domain keeps user pages out (~ paths); domains with an
# even domain hash additionally block the /docs/1* shard
ROBOTS_ALL = "/docs/~"
ROBOTS_EVEN = "/docs/1"


# ---------------------------------------------------------------------------
# raw-URL synthesis (four mess classes; byte-identical in both dialects)
# ---------------------------------------------------------------------------

def _raw_url_spark() -> str:
    host = ("concat('m', cast((doc_id div 2) % 7 as string),"
            " '.site-', cast((doc_id div 2) % 97 as string), '.com')")
    p = "cast(doc_id div 2 as string)"
    return f"""CASE cast(doc_id % 4 as int)
        WHEN 0 THEN concat('https://', {host}, '/docs/a/../', {p},
            '?b=2&id=', {p}, '&utm_source=feed#top')
        WHEN 1 THEN concat('HTTPS://WWW.', upper({host}),
            ':443/docs/./', {p}, '?id=', {p}, '&utm_campaign=x&b=2')
        WHEN 2 THEN concat('http://', {host}, ':80/docs/%7E', {p})
        ELSE concat('HTTP://', {host}, '/docs/~', {p}, '#s2')
        END"""


def _raw_url_duck() -> str:
    host = ("'m' || ((doc_id // 2) % 7)::VARCHAR || '.site-'"
            " || ((doc_id // 2) % 97)::VARCHAR || '.com'")
    p = "(doc_id // 2)::VARCHAR"
    return f"""CASE (doc_id % 4)::INT
        WHEN 0 THEN 'https://' || {host} || '/docs/a/../' || {p}
            || '?b=2&id=' || {p} || '&utm_source=feed#top'
        WHEN 1 THEN 'HTTPS://WWW.' || upper({host})
            || ':443/docs/./' || {p} || '?id=' || {p}
            || '&utm_campaign=x&b=2'
        WHEN 2 THEN 'http://' || {host} || ':80/docs/%7E' || {p}
        ELSE 'HTTP://' || {host} || '/docs/~' || {p} || '#s2'
        END"""


# ---------------------------------------------------------------------------
# canonicalization, as composable per-component expressions over a `u`
# column (so the idempotence proof can re-run them on the canon form)
# ---------------------------------------------------------------------------

def _scheme(u: str, duck: bool) -> str:
    pat = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
    pat = pat if duck else _spark_re(pat)
    return f"lower(regexp_extract({u}, '{pat}', 1))"


def _host(u: str, duck: bool) -> str:
    """lowercased authority, default port stripped (scheme-aware),
    leading www. stripped."""
    pat = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
    pat = pat if duck else _spark_re(pat)
    raw = f"lower(regexp_extract({u}, '{pat}', 1))"
    re80 = ":80$" if duck else _spark_re(":80$")
    re443 = ":443$" if duck else _spark_re(":443$")
    rewww = r"^www\." if duck else _spark_re(r"^www\.")

    def rr(e, p):
        return (f"regexp_replace({e}, '{p}', '', 'g')" if duck
                else f"regexp_replace({e}, '{p}', '')")
    np = (f"CASE WHEN {_scheme(u, duck)} = 'http' THEN {rr(raw, re80)}"
          f" WHEN {_scheme(u, duck)} = 'https' THEN {rr(raw, re443)}"
          f" ELSE {raw} END")
    return rr(f"({np})", rewww)


def _path(u: str, duck: bool) -> str:
    """dot segments resolved (2 fixed passes), %-decoded unreserved
    chars, '' -> '/'."""
    pat = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
    pat = pat if duck else _spark_re(pat)
    p = f"regexp_extract({u}, '{pat}', 1)"
    dot = r"/\./" if duck else _spark_re(r"/\./")
    up = r"/[^/]+/\.\./" if duck else _spark_re(r"/[^/]+/\.\./")
    def rr(e, pt):
        # no 'g' flag even on DuckDB: overlapping /a/../b/../ needs
        # sequential left-to-right resolution; the fixed passes supply it
        return f"regexp_replace({e}, '{pt}', '/')"
    e = p
    for _ in range(2):
        e = rr(e, dot)
    for _ in range(2):
        e = rr(e, up)
    e = f"replace(replace({e}, '%7E', '~'), '%7e', '~')"
    return f"CASE WHEN {e} = '' THEN '/' ELSE {e} END"


def _query(u: str, duck: bool) -> str:
    """tracking params dropped, survivors sorted, '' when none."""
    pat = r"\?([^#]*)" if duck else _spark_re(r"\?([^#]*)")
    q = (f"CASE WHEN instr({u}, '?') > 0"
         f" THEN regexp_extract({u}, '{pat}', 1) ELSE '' END")
    if duck:
        return (f"array_to_string(list_sort(list_filter("
                f"string_split({q}, '&'),"
                f" s -> s <> '' AND NOT starts_with(s, 'utm_'))), '&')")
    return (f"array_join(array_sort(filter(split({q}, '&'),"
            f" s -> s != '' and not startswith(s, 'utm_'))), '&')")


def _canon(u: str, duck: bool) -> str:
    sep = "||" if duck else None
    parts = [
        _scheme(u, duck), "'://'", _host(u, duck), _path(u, duck),
        (f"CASE WHEN {_query(u, duck)} <> '' THEN '?' || "
         f"{_query(u, duck)} ELSE '' END") if duck else
        (f"case when {_query(u, duck)} != '' then concat('?', "
         f"{_query(u, duck)}) else '' end"),
    ]
    if duck:
        return "(" + " || ".join(parts) + ")"
    return "concat(" + ", ".join(parts) + ")"


def _domain(host: str, duck: bool) -> str:
    """registered domain = last two labels of the canonical host."""
    pat = r"([^.]+\.[^.]+)$"
    pat = pat if duck else _spark_re(pat)
    return f"regexp_extract({host}, '{pat}', 1)"


# ---------------------------------------------------------------------------
# url_normalize
# ---------------------------------------------------------------------------

def _urls_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_spread(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            F.expr(_raw_url_spark()).alias("url_raw"),
        )
        .select(
            "doc_id",
            "url_raw",
            F.expr(_canon("url_raw", False)).alias("url_canon"),
            F.expr(_host("url_raw", False)).alias("host"),
            F.expr(_path("url_raw", False)).alias("path"),
        )
        .select(
            "*",
            F.expr(_domain("host", False)).alias("domain"),
        )
    )


def q_url_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical URL per page + the idempotence proof: re-normalizing
    the canonical form must be a fixed point (canon(canon) = canon),
    the property that makes canonical URLs a safe join/dedup key."""
    return _urls_df(spark, sf_dir).select(
        "doc_id",
        "url_raw",
        "url_canon",
        "host",
        "domain",
        F.expr("url_canon != url_raw").alias("changed"),
        F.expr(
            f"{_canon('url_canon', False)} = url_canon"
        ).alias("idempotent"),
    )


def _urls_cte() -> str:
    return f"""raw AS (
            SELECT doc_id, {_raw_url_duck()} AS url_raw FROM documents
        ),
        urls AS (
            SELECT doc_id, url_raw,
                   {_canon("url_raw", True)} AS url_canon,
                   {_host("url_raw", True)} AS host,
                   {_path("url_raw", True)} AS path,
                   {_domain(_host("url_raw", True), True)} AS domain
            FROM raw
        )"""


def sql_url_normalize() -> str:
    return f"""
        WITH {_urls_cte()}
        SELECT doc_id, url_raw, url_canon, host, domain,
               url_canon <> url_raw AS changed,
               {_canon("url_canon", True)} = url_canon AS idempotent
        FROM urls
    """


# ---------------------------------------------------------------------------
# domain_stats
# ---------------------------------------------------------------------------

def q_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered-domain rollup: page count, distinct hosts, distinct
    canonical URLs, and the duplicate-fetch share (pages whose
    canonical form another raw URL already covers) in exact ppm."""
    urls = _urls_df(spark, sf_dir)
    return urls.groupBy("domain").agg(
        F.count("*").cast("bigint").alias("n_pages"),
        F.countDistinct("host").cast("bigint").alias("n_hosts"),
        F.countDistinct("url_canon").cast("bigint").alias("n_canonical"),
        F.expr(
            "cast((count(*) - count(distinct url_canon)) * 1000000"
            " div count(*) as bigint)"
        ).alias("dup_ppm"),
    )


def sql_domain_stats() -> str:
    return f"""
        WITH {_urls_cte()}
        SELECT domain,
               COUNT(*)::BIGINT AS n_pages,
               COUNT(DISTINCT host)::BIGINT AS n_hosts,
               COUNT(DISTINCT url_canon)::BIGINT AS n_canonical,
               ((COUNT(*) - COUNT(DISTINCT url_canon)) * 1000000
                // COUNT(*))::BIGINT AS dup_ppm
        FROM urls GROUP BY domain
    """


# ---------------------------------------------------------------------------
# robots_filter
# ---------------------------------------------------------------------------

def _rules_df(urls: DataFrame) -> DataFrame:
    return (
        urls.select("domain")
        .distinct()
        .select(
            "domain",
            F.lit(ROBOTS_ALL).alias("rule_all"),
            F.expr(
                f"case when {_h30_spark('domain')} % 2 = 0"
                f" then '{ROBOTS_EVEN}' end"
            ).alias("rule_even"),
        )
    )


def q_robots_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-URL robots verdict: the domain's disallow prefixes
    (synthesised from the domain hash — every domain blocks the ~user
    pages, even-hash domains also block the /docs/1* shard) broadcast
    onto the URL table; prefix match on the CANONICAL path so encoded
    or dot-segment variants cannot sneak past the rule."""
    urls = _urls_df(spark, sf_dir)
    rules = _rules_df(urls)
    return urls.join(F.broadcast(rules), "domain").select(
        "doc_id",
        "url_canon",
        "domain",
        F.expr(
            f"case when startswith(path, rule_all) then rule_all"
            f" when rule_even is not null"
            f" and startswith(path, rule_even) then rule_even end"
        ).alias("matched_rule"),
    ).select(
        "doc_id",
        "url_canon",
        "domain",
        "matched_rule",
        F.expr("matched_rule is null").alias("allowed"),
    )


def sql_robots_filter() -> str:
    h = _h30_duck("domain")
    return f"""
        WITH {_urls_cte()},
        rules AS (
            SELECT DISTINCT domain,
                   '{ROBOTS_ALL}' AS rule_all,
                   CASE WHEN {h} % 2 = 0 THEN '{ROBOTS_EVEN}' END
                       AS rule_even
            FROM urls
        ),
        verdicts AS (
            SELECT doc_id, url_canon, u.domain,
                   CASE WHEN starts_with(path, rule_all) THEN rule_all
                        WHEN rule_even IS NOT NULL
                             AND starts_with(path, rule_even)
                            THEN rule_even END AS matched_rule
            FROM urls u JOIN rules USING (domain)
        )
        SELECT doc_id, url_canon, domain, matched_rule,
               matched_rule IS NULL AS allowed
        FROM verdicts
    """


# ---------------------------------------------------------------------------
# crawl_frontier
# ---------------------------------------------------------------------------

def q_crawl_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scheduler step: canonical URLs that are (a) robots-allowed,
    (b) not yet crawled (no seen page maps to them), ranked by the
    deterministic URL hash (frontier randomization) and capped at
    FRONTIER_K per domain (politeness). n_refs — how many raw
    observations collapsed into the candidate — rides along as the
    popularity signal a production scheduler would blend in.

    Shuffle inventory: one groupBy on the uniform canonical-URL key
    (candidate collapse), one broadcast of the per-domain candidate
    counts, then a window over ONLY the hash-prefiltered rows
    (~FRONTIER_K x safety per domain) — the stratified_sample
    discipline, so a link-farm mega-domain cannot concentrate a
    partition."""
    urls = _urls_df(spark, sf_dir)
    rules = _rules_df(urls)
    cand = (
        urls.join(F.broadcast(rules), "domain")
        .where(
            f"not (startswith(path, rule_all)"
            f" or (rule_even is not null"
            f" and startswith(path, rule_even)))"
        )
        .groupBy("domain", "url_canon")
        .agg(
            F.count("*").cast("bigint").alias("n_refs"),
            F.max(
                F.expr(f"case when doc_id % {SEEN_MOD} = 0 then 1"
                       " else 0 end")
            ).alias("seen"),
        )
        .where("seen = 0")
        .select(
            "domain",
            "url_canon",
            "n_refs",
            F.expr(_h30_spark("url_canon")).alias("h"),
        )
    )
    sizes = cand.groupBy("domain").agg(
        F.count("*").cast("bigint").alias("n_domain")
    )
    bound = (
        f"least(cast({C.H30_MOD} as bigint),"
        f" cast(ceil({FRONTIER_K} * {FRONTIER_SAFETY}"
        f" * cast({C.H30_MOD} as bigint) / n_domain) as bigint))"
    )
    pre = cand.join(F.broadcast(sizes), "domain").where(F.expr(f"h < {bound}"))
    w = Window.partitionBy("domain").orderBy(F.asc("h"), F.asc("url_canon"))
    return (
        pre.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= FRONTIER_K)
        .select("domain", "rk", "url_canon", "n_refs")
    )


def sql_crawl_frontier() -> str:
    h = _h30_duck("url_canon")
    hdom = _h30_duck("domain")
    bound = (
        f"least({C.H30_MOD}::BIGINT,"
        f" ceil({FRONTIER_K} * {FRONTIER_SAFETY} * {C.H30_MOD}::BIGINT"
        f" / n_domain)::BIGINT)"
    )
    return f"""
        WITH {_urls_cte()},
        rules AS (
            SELECT DISTINCT domain,
                   '{ROBOTS_ALL}' AS rule_all,
                   CASE WHEN {hdom} % 2 = 0 THEN '{ROBOTS_EVEN}' END
                       AS rule_even
            FROM urls
        ),
        cand AS (
            SELECT u.domain, url_canon,
                   COUNT(*)::BIGINT AS n_refs,
                   MAX(CASE WHEN doc_id % {SEEN_MOD} = 0
                       THEN 1 ELSE 0 END) AS seen,
                   {h} AS h
            FROM urls u JOIN rules USING (domain)
            WHERE NOT (starts_with(path, rule_all)
                       OR (rule_even IS NOT NULL
                           AND starts_with(path, rule_even)))
            GROUP BY u.domain, url_canon
        ),
        unseen AS (SELECT * FROM cand WHERE seen = 0),
        sizes AS (
            SELECT domain, COUNT(*)::BIGINT AS n_domain
            FROM unseen GROUP BY domain
        ),
        pre AS (
            SELECT unseen.* , sizes.n_domain
            FROM unseen JOIN sizes USING (domain)
            WHERE h < {bound}
        ),
        ranked AS (
            SELECT domain, url_canon, n_refs,
                   row_number() OVER (
                       PARTITION BY domain ORDER BY h ASC, url_canon ASC
                   )::BIGINT AS rk
            FROM pre
        )
        SELECT domain, rk, url_canon, n_refs
        FROM ranked WHERE rk <= {FRONTIER_K}
    """
