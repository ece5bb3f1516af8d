"""URL canonicalization + URL-level dedup for web-corpus curation.

A web-scale training corpus is keyed by URL (Common-Crawl WARC
records are), and the same page arrives under many spellings: scheme
or host case, an explicit default port, a ``www.`` prefix, duplicate
or trailing slashes, tracking query parameters (``utm_*`` & co.),
param order, fragments. The standard pipeline step (C4 / CCNet style)
canonicalizes the URL and keeps one document per canonical key.

Everything here is pure JVM column expressions (regexp + array ops,
whole-stage codegen, no Python), so normalization is a narrow map —
zero shuffle — and the dedup itself is ONE hash aggregation on the
canonical key with map-side partial aggregation (min-by), which is
the minimum possible data movement for exact keyed dedup at 100 TB.

Pattern language is the Java∩RE2 subset (see functions/pii.py) so
the DuckDB oracle in ``__spark_entry__`` is exact.

Canonicalization contract (applied in order):
1. trim surrounding whitespace; strip the ``#fragment``;
2. scheme lowercased (absent scheme → ``http``; protocol-relative
   ``//host/path`` → ``http://host/path``);
3. host lowercased, leading ``www.`` stripped, default port
   (``:80`` http, ``:443`` https) stripped;
4. path: runs of ``/`` collapsed to one, trailing ``/`` stripped
   (``/`` alone → empty);
5. query: split on ``&``, empty params and tracking params dropped
   (exact-name match against TRACKING_PARAMS or ``utm_`` prefix),
   remaining params sorted bytewise and re-joined; empty → no ``?``.

Reference scope note: the reference engine (quickwit 0.2) ingests
documents as-is and has no URL ops — this module is part of the
training-data-pipeline tier layered on the same corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# exact-name tracking params (plus any name starting with "utm_")
TRACKING_PARAMS: tuple[str, ...] = (
    "fbclid", "gclid", "msclkid", "mc_cid", "mc_eid", "ref", "ref_src",
    "igshid", "spm", "yclid",
)

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"\?([^#]*)"


def _is_tracking(name: Column) -> Column:
    cond = name.startswith("utm_")
    for p in TRACKING_PARAMS:
        cond = cond | (name == F.lit(p))
    return cond


def normalize_url(url: Column) -> Column:
    """Canonical URL per the module contract — one nested JVM
    expression, no Python, no shuffle."""
    u = F.regexp_replace(F.trim(url), r"#.*$", "")
    # absent scheme -> prepend http:// so the component regexes apply;
    # protocol-relative '//host/path' (common in crawl hrefs) first
    # drops its leading slashes so the host isn't swallowed by the path
    u = F.when(u.rlike(_SCHEME_RE), u).otherwise(
        F.concat(F.lit("http://"), F.regexp_replace(u, r"^//", ""))
    )
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    host = F.lower(F.regexp_extract(u, _HOST_RE, 1))
    host = F.regexp_replace(host, r"^www\.", "")
    host = F.when(
        (scheme == "http"), F.regexp_replace(host, r":80$", "")
    ).otherwise(host)
    host = F.when(
        (scheme == "https"), F.regexp_replace(host, r":443$", "")
    ).otherwise(host)
    path = F.regexp_extract(u, _PATH_RE, 1)
    path = F.regexp_replace(path, r"/{2,}", "/")
    path = F.regexp_replace(path, r"/$", "")
    query = F.regexp_extract(u, _QUERY_RE, 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~_is_tracking(F.regexp_extract(p, r"^([^=]*)", 1)),
    )
    qnorm = F.array_join(F.array_sort(params), "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qnorm == "", F.lit("")).otherwise(F.concat(F.lit("?"), qnorm)),
    )


def with_url_norm(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Add ``url_norm`` — the canonical form of ``url_col``."""
    return df.withColumn("url_norm", normalize_url(F.col(url_col)))


def dedup_urls(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """One row per canonical URL: the kept doc (min ``id_col`` —
    deterministic) and the duplicate count.

    Plan shape: narrow map (normalize) → ONE groupBy(url_norm) with
    map-side partial min/count — no join, no second shuffle. At
    100 TB the canonical key is well-distributed (hash of full URLs),
    so no salting is needed; a pathological single-URL hot key would
    still partially aggregate map-side.
    """
    d = with_url_norm(df, url_col)
    return d.groupBy("url_norm").agg(
        F.min(F.col(id_col)).alias("kept_doc_id"),
        (F.count(F.lit(1)) - 1).alias("n_dups"),
    )


def urlnorm_oracle_expr(url_expr: str) -> str:
    """DuckDB SQL expression mirroring :func:`normalize_url` exactly
    (same Java∩RE2 patterns, same step order)."""
    track = " OR ".join(
        [f"regexp_extract(p, '^([^=]*)', 1) = '{t}'" for t in TRACKING_PARAMS]
    )
    return f"""(
WITH s0 AS (
  SELECT regexp_replace(trim({url_expr}), '#.*$', '') AS u0
), s1 AS (
  SELECT CASE WHEN regexp_matches(u0, '{_SCHEME_RE}')
              THEN u0
              ELSE 'http://' || regexp_replace(u0, '^//', '') END AS u
  FROM s0
), parts AS (
  -- DuckDB regexp_extract is NULL on no-match where Spark's is '' —
  -- coalesce each component to keep the two engines aligned
  SELECT lower(coalesce(regexp_extract(u, '{_SCHEME_RE}', 1), '')) AS scheme,
         lower(coalesce(regexp_extract(u, '{_HOST_RE}', 1), '')) AS rawhost,
         coalesce(regexp_extract(u, '{_PATH_RE}', 1), '') AS rawpath,
         coalesce(regexp_extract(u, '\\?([^#]*)', 1), '') AS query
  FROM s1
), hostn AS (
  SELECT scheme, rawpath, query,
         CASE WHEN scheme = 'http'
              THEN regexp_replace(regexp_replace(rawhost, '^www\\.', ''), ':80$', '')
              WHEN scheme = 'https'
              THEN regexp_replace(regexp_replace(rawhost, '^www\\.', ''), ':443$', '')
              ELSE regexp_replace(rawhost, '^www\\.', '') END AS host
  FROM parts
), pathn AS (
  SELECT scheme, host, query,
         regexp_replace(regexp_replace(rawpath, '/{{2,}}', '/', 'g'), '/$', '') AS path
  FROM hostn
), qn AS (
  -- coalesce: DuckDB array_to_string([]) is NULL, Spark array_join([]) is ''
  SELECT scheme, host, path,
         coalesce(array_to_string(list_sort(list_filter(string_split(query, '&'),
           p -> p <> ''
                AND NOT (regexp_extract(p, '^([^=]*)', 1) LIKE 'utm\\_%' ESCAPE '\\'
                         OR {track}))), '&'), '') AS qnorm
  FROM pathn
)
SELECT scheme || '://' || host || path ||
       CASE WHEN qnorm = '' THEN '' ELSE '?' || qnorm END
FROM qn
)"""


def url_host(url: Column) -> Column:
    """Canonical host of a URL for domain-level decisions: lowercase,
    ``www.`` prefix stripped, any ``:port`` stripped. Pure JVM regex
    (Java∩RE2 subset) — narrow map, no shuffle."""
    u = F.trim(url)
    u = F.when(u.rlike(_SCHEME_RE), u).otherwise(
        F.concat(F.lit("http://"), F.regexp_replace(u, r"^//", ""))
    )
    host = F.lower(F.regexp_extract(u, _HOST_RE, 1))
    host = F.regexp_replace(host, r"^www\.", "")
    return F.regexp_replace(host, r":[0-9]+$", "")


def blocklist_filter(
    df: DataFrame,
    blocklist: list[str] | DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """Domain-blocklist curation: flag every doc whose URL host equals
    a blocked domain OR is a subdomain of one (label-boundary suffix
    match — ``cdn.spam.com`` is blocked by ``spam.com`` but
    ``notspam.com`` is not). The standard "remove known-bad domains"
    step (C4's badwords domains, RefinedWeb's blocklists; the
    reference engine ingests docs as-is — this is the curation tier
    over the same corpus).

    Scale shape — the naive spelling is a non-equi join
    (``host = d OR host LIKE '%.' || d``), which Spark can only run
    as a nested-loop join: O(docs × blocklist) comparisons. Real
    blocklists are 10^5-10^6 domains, so at 100 TB that is a
    scale-killer. Instead the host explodes into its label suffixes
    (``a.b.c.com`` → 4 candidate domains, bounded by label count) and
    equi-joins the blocklist — a broadcast HASH join: O(docs ×
    labels) probes. Returns one row per input doc:
    ``(id_col, host, matched_domain, blocked)`` with
    ``matched_domain`` the LONGEST (most specific) matching entry,
    ties impossible (suffixes of one host have distinct lengths).
    """
    spark = df.sparkSession
    if isinstance(blocklist, DataFrame):
        bdf = blocklist.select(F.col(blocklist.columns[0]).alias("__domain"))
    else:
        bdf = spark.createDataFrame(
            [(d.lower(),) for d in blocklist], "__domain string"
        )
    hosts = df.select(
        F.col(id_col), url_host(F.col(url_col)).alias("host")
    )
    labels = F.split(F.col("host"), r"\.")
    n = F.size(labels)
    # every label-boundary suffix of the host, host itself included
    suffixes = F.transform(
        F.sequence(F.lit(0), n - 1),
        lambda i: F.array_join(F.slice(labels, i + 1, n - i), "."),
    )
    cand = hosts.withColumn(
        "__domain", F.explode(suffixes)
    )
    matched = (
        cand.join(F.broadcast(bdf), "__domain")
        # most specific (longest) matching entry per doc — suffixes of
        # one host have strictly distinct lengths, so max() is unique
        .groupBy(id_col, "host")
        .agg(F.max_by("__domain", F.length("__domain")).alias("matched_domain"))
    )
    return (
        hosts.join(matched.select(id_col, "matched_domain"), id_col, "left")
        .withColumn("blocked", F.col("matched_domain").isNotNull())
    )
