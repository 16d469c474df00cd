"""Domain/URL-level corpus curation — the operators every web-scale
LLM corpus pipeline runs BEFORE content-level dedup (VERDICT r6 task
3; the reference has no text surface at all, so there is no
counterpart to cite — this family belongs to the engine's
LLM-pipeline brief next to `pipeline/dedup.py` and
`pipeline/text.py`):

- :func:`with_url` — deterministic URL fixture over ``doc_id`` (the
  test tables carry no URL column; the same arithmetic/string SQL
  runs in DuckDB, the established fixture pattern of the geo gates).
- :func:`url_canonicalize` — scheme/host lowercasing, ``www.``
  stripping, default-port removal, fragment removal, tracking-param
  removal (``utm_*``/``gclid``/``fbclid``), query-param sorting,
  trailing-slash normalization. Pure string/array column work: per
  row, no shuffle, no UDF (the only higher-order functions run over
  the <=4-element param array — interpreted but O(params), nowhere
  near the minhash HOF trap's per-shingle hot loop).
- :func:`registrable_domain` — public-suffix-style registrable
  domain with a FIXED two-label-suffix rule subset (documented; a
  live PSL fetch would not be oracle-reproducible).
- :func:`domain_cap` — deterministic per-domain document cap, the
  standard over-represented-host guard. One shuffle on the domain
  key; at 100 TB a hot domain still sorts only ITS rows inside one
  partition's window — for truly pathological hosts the two-phase
  variant (pre-count + broadcast threshold filter) drops the sort,
  but the cap-k window is the canonical shape.
- :func:`url_dedup` — URL-level exact dedup on the canonical form
  (keep lowest doc_id), the cheapest dedup tier: one shuffle on the
  canonical-URL key, run before any content hashing.

All four are driver gates (`doc_url_canonical`, `doc_domain_rollup`,
`doc_domain_cap`, `doc_url_dedup`) bit-compared against independent
DuckDB reimplementations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# fixed public-suffix rule subset: second-level suffixes under which
# the registrable domain takes THREE labels (the rule form of the
# public suffix list; subset so the DuckDB oracle can mirror it)
TWO_LABEL_SUFFIXES = ("co.uk", "org.uk", "ac.uk", "com.au", "co.jp",
                      "co.nz", "com.br", "co.in")

TRACKING_PREFIXES = ("utm_", "gclid=", "fbclid=")

# deterministic URL fixture over doc_id — VALID IN BOTH ENGINES
# (modular arithmetic + simple CASE + || concat; exercises every
# canonicalization rule: case noise, www., default and non-default
# ports, tracking params in both positions, fragments, trailing
# slashes, multi-level public suffixes)
URL_FIXTURE_SQL = """
CASE WHEN doc_id % 6 = 0 THEN 'HTTPS'
     WHEN doc_id % 3 = 0 THEN 'https' ELSE 'http' END
|| '://'
|| CASE doc_id % 10
     WHEN 0 THEN 'www.Example.COM'   WHEN 1 THEN 'example.com'
     WHEN 2 THEN 'news.example.com'  WHEN 3 THEN 'blog.example.co.uk'
     WHEN 4 THEN 'example.co.uk'     WHEN 5 THEN 'CDN.Media.org'
     WHEN 6 THEN 'media.org'         WHEN 7 THEN 'shop.store.net'
     WHEN 8 THEN 'www.store.net'     ELSE 'archive.example.com' END
|| CASE WHEN doc_id % 11 = 0 THEN ':8080'
        WHEN doc_id % 5 = 0 AND doc_id % 3 = 0 THEN ':443'
        WHEN doc_id % 5 = 0 THEN ':80' ELSE '' END
|| '/p/' || CAST(doc_id % 150 AS VARCHAR(8))
|| CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END
|| CASE WHEN doc_id % 9 = 0
          THEN '?utm_source=feed&id=' || CAST(doc_id % 50 AS VARCHAR(8))
        WHEN doc_id % 2 = 0
          THEN '?id=' || CAST(doc_id % 50 AS VARCHAR(8)) || '&utm_campaign=x'
        WHEN doc_id % 7 = 0
          THEN '?id=' || CAST(doc_id % 50 AS VARCHAR(8)) || '&gclid=abc123'
        ELSE '?id=' || CAST(doc_id % 50 AS VARCHAR(8)) END
|| CASE WHEN doc_id % 8 = 0 THEN '#sec2' ELSE '' END
"""


def with_url(docs: DataFrame) -> DataFrame:
    """documents + a deterministic ``url`` column (fixture)."""
    return docs.withColumn("url", F.expr(URL_FIXTURE_SQL))


def url_canonicalize(df: DataFrame, url_col: str = "url",
                     out_col: str = "canon_url") -> DataFrame:
    """Append the canonical form of ``url_col``. Canonical = lowercase
    scheme and host, ``www.`` stripped, default port (http:80 /
    https:443) stripped, fragment dropped, tracking params
    (``utm_*``, ``gclid``, ``fbclid``) dropped, remaining query params
    sorted, trailing path slash stripped (except root). Per-row column
    work only."""
    u = F.col(url_col)
    nofrag = F.substring_index(u, "#", 1)
    scheme = F.lower(F.substring_index(nofrag, "://", 1))
    rest = F.substring_index(nofrag, "://", -1)
    slash = F.instr(rest, "/")
    hostport = F.when(slash > 0,
                      F.substring(rest, F.lit(1), slash - 1)) \
        .otherwise(rest)
    pathq = F.when(slash > 0, F.substring(rest, slash, F.length(rest))) \
        .otherwise(F.lit("/"))
    host = F.lower(F.substring_index(hostport, ":", 1))
    host = F.when(host.startswith("www."),
                  F.substring(host, 5, F.length(host))).otherwise(host)
    port = F.when(F.instr(hostport, ":") > 0,
                  F.substring_index(hostport, ":", -1)).otherwise(F.lit(""))
    portk = F.when(
        (port == "") | ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443")),
        F.lit("")).otherwise(F.concat(F.lit(":"), port))
    qpos = F.instr(pathq, "?")
    path = F.when(qpos > 0, F.substring(pathq, F.lit(1), qpos - 1)) \
        .otherwise(pathq)
    path = F.when((path != "/") & path.endswith("/"),
                  F.substring(path, F.lit(1), F.length(path) - 1)) \
        .otherwise(path)
    query = F.when(qpos > 0,
                   F.substring(pathq, qpos + 1, F.length(pathq))) \
        .otherwise(F.lit(""))
    keep = F.filter(
        F.split(query, "&"),
        lambda p: (p != "")
        & ~p.startswith(TRACKING_PREFIXES[0])
        & ~p.startswith(TRACKING_PREFIXES[1])
        & ~p.startswith(TRACKING_PREFIXES[2]))
    qs = F.concat_ws("&", F.array_sort(keep))
    canon = F.concat(
        scheme, F.lit("://"), host, portk, path,
        F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")))
    return df.withColumn(out_col, canon)


def registrable_domain(df: DataFrame, host_col_expr=None,
                       url_col: str = "canon_url",
                       out_col: str = "domain") -> DataFrame:
    """Append the registrable domain of the (canonical) URL's host:
    the last two labels, or the last three when the last two form one
    of the fixed :data:`TWO_LABEL_SUFFIXES` rules."""
    host = (host_col_expr if host_col_expr is not None else
            F.substring_index(F.substring_index(
                F.substring_index(F.col(url_col), "://", -1), "/", 1),
                ":", 1))
    labels = F.split(host, "[.]")
    n = F.size(labels)
    last2 = F.concat_ws(".", F.slice(labels, -2, 2))
    last3 = F.concat_ws(".", F.slice(labels, -3, 3))
    dom = (F.when((n >= 3) & last2.isin(*TWO_LABEL_SUFFIXES), last3)
           .when(n >= 2, last2).otherwise(host))
    return df.withColumn(out_col, dom)


def domain_cap(df: DataFrame, k: int,
               domain_col: str = "domain",
               buckets: int = 32) -> DataFrame:
    """Deterministic per-domain cap: keep the ``k`` lowest-doc_id rows
    of each registrable domain (rank exposed as ``rk``).

    TWO-PHASE (r8, VERDICT r7 task 3 — hot-domain skew-proof): a
    single ``row_number`` window over ``domain`` puts a pathological
    domain holding a large corpus fraction on ONE task at 100 TB.
    Phase 1 windows over (domain, deterministic doc_id hash bucket) —
    the hot domain spreads over ``buckets`` tasks — and keeps each
    bucket's k lowest doc_ids. Phase 2 re-ranks the survivors (at most
    k x buckets rows per domain on any task) over ``domain`` alone.
    Identical output: every one of a domain's k globally-lowest
    doc_ids is among its own bucket's k lowest, so phase 1 never drops
    a final survivor, and re-ranking survivors by the same unique key
    assigns the same rk 1..k. Skew bound pinned in
    tests/test_skew.py::test_domain_cap_* ."""
    from pyspark.sql.window import Window
    wl = Window.partitionBy(domain_col, "_dcb").orderBy("doc_id")
    local = (df.withColumn("_dcb", F.pmod(F.xxhash64("doc_id"),
                                          F.lit(int(buckets))))
             .withColumn("_lrk", F.row_number().over(wl))
             .where(F.col("_lrk") <= int(k)))
    w = Window.partitionBy(domain_col).orderBy("doc_id")
    return (local.withColumn("rk", F.row_number().over(w).cast("bigint"))
            .where(F.col("rk") <= int(k))
            .drop("_dcb", "_lrk"))


def url_dedup(df: DataFrame,
              canon_col: str = "canon_url") -> DataFrame:
    """URL-level exact dedup on the canonical form: one row per
    canonical URL with the kept (lowest) doc_id and the copy count.
    ONE shuffle on the canonical-URL key; map-side partial min/count
    make a hot URL cheap."""
    return (df.groupBy(canon_col)
            .agg(F.min("doc_id").cast("bigint").alias("keep_doc_id"),
                 F.count("*").cast("bigint").alias("n_copies")))


# ---------------------------------------------------------------- oracles

def _duck_canon_cte() -> str:
    """DuckDB CTE chain producing (doc_id, url, canon_url, domain) —
    an INDEPENDENT reimplementation of the canonicalization and
    registrable-domain rules (string_split/list_filter/list_sort vs
    Spark's split/filter/array_sort)."""
    return f"""
raw AS (SELECT doc_id, {URL_FIXTURE_SQL} AS url FROM documents),
p1 AS (SELECT doc_id, url,
         CASE WHEN instr(url, '#') > 0
              THEN substr(url, 1, instr(url, '#') - 1)
              ELSE url END AS nofrag
       FROM raw),
p2 AS (SELECT *, lower(substr(nofrag, 1, instr(nofrag, '://') - 1))
                AS scheme,
               substr(nofrag, instr(nofrag, '://') + 3) AS rest
       FROM p1),
p3 AS (SELECT *,
         CASE WHEN instr(rest, '/') > 0
              THEN substr(rest, 1, instr(rest, '/') - 1)
              ELSE rest END AS hostport,
         CASE WHEN instr(rest, '/') > 0
              THEN substr(rest, instr(rest, '/')) ELSE '/' END AS pathq
       FROM p2),
p4 AS (SELECT *,
         CASE WHEN starts_with(lower(CASE WHEN instr(hostport, ':') > 0
                   THEN substr(hostport, 1, instr(hostport, ':') - 1)
                   ELSE hostport END), 'www.')
              THEN substr(lower(CASE WHEN instr(hostport, ':') > 0
                   THEN substr(hostport, 1, instr(hostport, ':') - 1)
                   ELSE hostport END), 5)
              ELSE lower(CASE WHEN instr(hostport, ':') > 0
                   THEN substr(hostport, 1, instr(hostport, ':') - 1)
                   ELSE hostport END) END AS host,
         CASE WHEN instr(hostport, ':') > 0
              THEN substr(hostport, instr(hostport, ':') + 1)
              ELSE '' END AS port
       FROM p3),
p5 AS (SELECT *,
         CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
                   OR (scheme = 'https' AND port = '443')
              THEN '' ELSE ':' || port END AS portk,
         CASE WHEN instr(pathq, '?') > 0
              THEN substr(pathq, 1, instr(pathq, '?') - 1)
              ELSE pathq END AS path0,
         CASE WHEN instr(pathq, '?') > 0
              THEN substr(pathq, instr(pathq, '?') + 1)
              ELSE '' END AS query
       FROM p4),
p6 AS (SELECT *,
         CASE WHEN path0 <> '/' AND path0 LIKE '%/'
              THEN substr(path0, 1, length(path0) - 1)
              ELSE path0 END AS path,
         array_to_string(list_sort(list_filter(string_split(query, '&'),
           p -> p <> '' AND NOT starts_with(p, 'utm_')
                AND NOT starts_with(p, 'gclid=')
                AND NOT starts_with(p, 'fbclid='))), '&') AS qs
       FROM p5),
canon AS (SELECT doc_id, url,
            scheme || '://' || host || portk || path ||
            CASE WHEN qs <> '' THEN '?' || qs ELSE '' END AS canon_url,
            string_split(host, '.') AS labels
          FROM p6),
dom AS (SELECT doc_id, url, canon_url,
          CASE WHEN len(labels) >= 3
                    AND (labels[-2] || '.' || labels[-1]) IN
                        {TWO_LABEL_SUFFIXES!r}
               THEN labels[-3] || '.' || labels[-2] || '.' || labels[-1]
               WHEN len(labels) >= 2
               THEN labels[-2] || '.' || labels[-1]
               ELSE array_to_string(labels, '.') END AS domain
        FROM canon)"""


def oracle_url_canonical() -> str:
    return f"""
WITH {_duck_canon_cte()}
SELECT CAST(doc_id AS BIGINT) AS doc_id, url, canon_url
FROM dom ORDER BY doc_id
"""


def oracle_domain_rollup() -> str:
    return f"""
WITH {_duck_canon_cte()}
SELECT domain, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT canon_url) AS BIGINT) AS n_urls
FROM dom GROUP BY domain ORDER BY domain
"""


def oracle_domain_cap(k: int) -> str:
    return f"""
WITH {_duck_canon_cte()}
SELECT CAST(doc_id AS BIGINT) AS doc_id, domain, CAST(rk AS BIGINT) AS rk
FROM (SELECT doc_id, domain,
             ROW_NUMBER() OVER (PARTITION BY domain ORDER BY doc_id)
               AS rk
      FROM dom)
WHERE rk <= {int(k)} ORDER BY domain, rk
"""


def oracle_url_dedup() -> str:
    return f"""
WITH {_duck_canon_cte()}
SELECT canon_url, CAST(MIN(doc_id) AS BIGINT) AS keep_doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_copies
FROM dom GROUP BY canon_url ORDER BY canon_url
"""
