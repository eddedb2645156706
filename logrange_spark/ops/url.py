"""URL normalization, URL-level deduplication, and domain statistics.

The first stage of every web-corpus pipeline (RefinedWeb §3.1 "URL
filtering", Penedo et al. 2023; CCNet and Dolma both key their exact
dedup on the target URI) is URL-level: the same page is fetched many
times under cosmetically different URLs — scheme variants, ``www.``
prefixes, default ports, tracking parameters, reordered query strings,
trailing slashes, fragments — and collapsing those BEFORE any content
hashing removes the cheapest, largest duplicate class at zero content
cost.

Everything here is a pure Column expression chain (regexp + array
higher-order functions, JVM-side, whole-stage codegen): no UDFs, no
shuffle except the single hash aggregation the dedup itself requires.
At 100 TB the normalization is a free map stage and the dedup is one
groupBy on the canonical key — the exact shape of ``dedup.exact_*``.

The normalization rules are the RFC 3986 §6 safe set plus the
pipeline-standard tracking-parameter strip, chosen so Spark and the
DuckDB oracle compute byte-identical keys:

1. drop the fragment (``#...`` never reaches the server);
2. case-normalize scheme and host (RFC 3986 §6.2.2.1) — path and
   query stay case-sensitive;
3. treat ``http``/``https`` as one (dedup keys ignore the scheme:
   corpora crawl both and the content is the page, not the transport);
4. strip a ``www.`` host prefix and the default ports ``:80``/``:443``
   (the dedup key is scheme-insensitive, so both family defaults
   canonicalize away regardless of scheme); NON-default explicit ports
   are kept — ``example.com:8443/a`` is a different resource than
   ``example.com/a``;
5. drop tracking parameters: any name starting with ``utm_`` plus the
   click-id set in ``TRACKING_PARAMS`` — matched case-INsensitively on
   the parameter name (RFC 3986 makes query case-sensitive, but the
   emitters of tracking params do not: ``UTM_SOURCE=x`` is the same
   noise as ``utm_source=x``);
6. sort the surviving query parameters (``a=1&b=2`` == ``b=2&a=1``:
   RFC 3986 makes query order significant, but crawl frontiers emit
   both orders for the same resource — the standard pipeline choice
   is to canonicalize);
7. strip trailing slashes from the path (``/a/`` == ``/a``, ``/`` ==
   root).

Two canonicalization LEVELS, one rule set:

- :func:`canonical_url` — the lossless canonical FORM (scheme kept,
  non-default ports kept, null for unparseable input): what a crawler
  stores and re-fetches. ``F.try_parse_url``-based; python urllib twin
  in tests.
- :func:`normalize_url` — the aggressive dedup KEY (scheme- and
  ``www.``-insensitive): what the dedup stage groups by. Pure
  regexp/array expressions, portable to the DuckDB oracle
  (:func:`normalize_url_duckdb`).

Both strip the same tracking parameters (``utm_*`` prefix plus
``TRACKING_PARAMS``), sort the surviving query, drop fragments and
default ports.

Reference parity note: the reference engine (logrange) has no web-corpus
surface; this module is part of the beyond-reference training-data
pipeline layer alongside ops/dedup.py and ops/text.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Click/session identifiers stripped in addition to the utm_* prefix
# family (the set every major pipeline drops before URL comparison).
# Fixed, documented tuple — the DuckDB oracle embeds the same list.
TRACKING_PARAMS: tuple[str, ...] = (
    "gclid", "fbclid", "msclkid", "ref", "ref_src",
)


def _is_tracking(p: Column) -> Column:
    """True for a ``name=value`` query-param string that is tracking
    noise: ``utm_*`` by prefix, or a name in ``TRACKING_PARAMS``.
    The name test is case-insensitive (``UTM_SOURCE`` == ``utm_source``
    == tracking; emitters are not case-consistent)."""
    name = F.lower(F.split(p, "=")[0])
    return name.startswith("utm_") | name.isin(*TRACKING_PARAMS)

_SCHEME_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://"


def url_host(col: Column) -> Column:
    """Lowercased host of a URL, ``www.`` prefix and port dropped —
    the grouping key for domain-level statistics and blocklists."""
    hostport = F.regexp_extract(
        F.regexp_replace(col, _SCHEME_RE, ""), r"^([^/?#]*)", 1
    )
    host = F.lower(F.regexp_extract(hostport, r"^([^:]*)", 1))
    return F.regexp_replace(host, r"^www\.", "")


def normalize_url(col: Column) -> Column:
    """Canonical dedup key for a URL (rules in the module docstring).

    Returns ``host + path + '?' + sorted-kept-query`` — scheme-free,
    ``www.``-free, fragment-free, tracking-param-free, query-sorted,
    trailing-slash-free. Pure built-in expressions end to end.
    """
    no_frag = F.regexp_replace(col, r"#.*$", "")
    after = F.regexp_replace(no_frag, _SCHEME_RE, "")
    hostport = F.regexp_extract(after, r"^([^/?]*)", 1)
    # url_host drops ANY port (right for domain grouping); the dedup key
    # must keep a NON-default explicit port — :8443 is a different
    # resource. The key is scheme-insensitive, so both family defaults
    # (:80, :443) canonicalize away.
    pstr = F.regexp_extract(hostport, r":([0-9]+)$", 1)
    host = F.when(
        (pstr != "") & ~pstr.isin("80", "443"),
        F.concat(url_host(col), F.lit(":"), pstr),
    ).otherwise(url_host(col))
    rest = F.substring(
        after, F.length(hostport) + F.lit(1), F.lit(2_147_483_647)
    )
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    path_norm = F.regexp_replace(path, r"/+$", "")
    query = F.when(
        F.instr(rest, "?") > 0,
        F.substring(rest, F.instr(rest, "?") + 1, 2_147_483_647),
    ).otherwise(F.lit(""))
    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != F.lit("")) & ~_is_tracking(p),
        )
    )
    qjoin = F.array_join(kept, "&")
    return F.concat(
        host,
        path_norm,
        F.when(qjoin != "", F.concat(F.lit("?"), qjoin)).otherwise(F.lit("")),
    )


def canonical_url(col: Column) -> Column:
    """Canonical FORM of an http(s) URL (lossless level — see the module
    docstring):

    - scheme and host lowercased; explicit default ports (:80 http,
      :443 https) stripped, non-default ports kept;
    - fragment dropped;
    - tracking query parameters (``utm_*`` prefix + ``TRACKING_PARAMS``)
      dropped, the remaining parameters SORTED (param order is almost
      never semantic; sorting merges reordered variants);
    - trailing slash on a non-root path stripped ("/a/b/" == "/a/b");
      empty path becomes "/".

    Null for inputs ``F.try_parse_url`` cannot parse a scheme+host
    from (ANSI mode: plain parse_url raises on malformed URLs).
    The python twin (urllib-based) is pinned by
    tests/test_ops.py::test_canonical_url_matches_reference.
    """
    scheme = F.lower(F.try_parse_url(col, F.lit("PROTOCOL")))
    raw_host = F.lower(F.try_parse_url(col, F.lit("HOST")))
    port = F.try_parse_url(col, F.lit("AUTHORITY"))
    # parse_url HOST excludes the port; re-attach a NON-default explicit
    # port from the authority (default ports canonicalize away)
    pstr = F.regexp_extract(F.coalesce(port, F.lit("")), ":([0-9]+)$", 1)
    keep_port = (
        (pstr != "")
        & ~((scheme == "http") & (pstr == "80"))
        & ~((scheme == "https") & (pstr == "443"))
    )
    host = F.when(keep_port, F.concat(raw_host, F.lit(":"), pstr)).otherwise(
        raw_host
    )
    path = F.try_parse_url(col, F.lit("PATH"))
    path = F.when(path.isNull() | (path == ""), F.lit("/")).otherwise(path)
    path = F.when(
        (F.length(path) > 1) & path.endswith("/"),
        F.substring(path, F.lit(1), F.length(path) - 1),
    ).otherwise(path)
    query = F.try_parse_url(col, F.lit("QUERY"))
    kept = F.array_sort(
        F.filter(
            F.split(F.coalesce(query, F.lit("")), "&"),
            lambda p: (p != "") & ~_is_tracking(p),
        )
    )
    qpart = F.when(
        F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))
    ).otherwise(F.lit(""))
    return F.when(
        raw_host.isNull() | (raw_host == "") | scheme.isNull(),
        F.lit(None).cast("string"),
    ).otherwise(F.concat(scheme, F.lit("://"), host, path, qpart))


def url_duplicates(
    df: DataFrame, id_col: str = "doc_id", url_col: str = "url"
) -> DataFrame:
    """(canonical_url, keep_id, dup_count) for canonical-URL groups with
    more than one member — exact dedup after ``canonical_url``
    normalization (one groupBy on the canonical string; unparseable
    URLs are excluded rather than grouped together)."""
    return (
        df.select(canonical_url(F.col(url_col)).alias("canonical_url"),
                  F.col(id_col))
        .where(F.col("canonical_url").isNotNull())
        .groupBy("canonical_url")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("dup_count"))
        .where(F.col("dup_count") > 1)
    )


def url_host_duckdb(col_sql: str) -> str:
    """DuckDB expression computing :func:`url_host` for ``col_sql`` —
    generated here so the oracle can never drift from the Spark rules."""
    after = f"regexp_replace({col_sql}, '{_SCHEME_RE}', '')"
    hostport = f"regexp_extract({after}, '^([^/?#]*)', 1)"
    host = f"lower(regexp_extract({hostport}, '^([^:]*)', 1))"
    return f"regexp_replace({host}, '^www\\.', '')"


def normalize_url_duckdb(col_sql: str) -> str:
    """DuckDB expression computing :func:`normalize_url` for
    ``col_sql`` — the registry-oracle twin, kept adjacent to the Spark
    expression so every rule change touches both."""
    tracked = ", ".join(f"'{p}'" for p in TRACKING_PARAMS)
    no_frag = f"regexp_replace({col_sql}, '#.*$', '')"
    after = f"regexp_replace({no_frag}, '{_SCHEME_RE}', '')"
    hostport = f"regexp_extract({after}, '^([^/?]*)', 1)"
    pstr = f"regexp_extract({hostport}, ':([0-9]+)$', 1)"
    bare_host = url_host_duckdb(col_sql)
    host = (
        f"CASE WHEN {pstr} <> '' AND {pstr} NOT IN ('80', '443') "
        f"THEN {bare_host} || ':' || {pstr} ELSE {bare_host} END"
    )
    rest = f"substring({after}, length({hostport}) + 1)"
    path = f"regexp_extract({rest}, '^([^?]*)', 1)"
    path_norm = f"regexp_replace({path}, '/+$', '')"
    query = (
        f"CASE WHEN instr({rest}, '?') > 0 "
        f"THEN substring({rest}, instr({rest}, '?') + 1) ELSE '' END"
    )
    kept = (
        f"list_sort(list_filter(string_split({query}, '&'), "
        f"p -> p <> '' AND NOT starts_with(lower(string_split(p, '=')[1]), 'utm_') "
        f"AND lower(string_split(p, '=')[1]) NOT IN ({tracked})))"
    )
    qjoin = f"array_to_string({kept}, '&')"
    return (
        f"({host} || {path_norm} || "
        f"CASE WHEN {qjoin} <> '' THEN '?' || {qjoin} ELSE '' END)"
    )


def url_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    url_col: str = "url",
    quality_col: str | None = None,
) -> DataFrame:
    """URL-level dedup: one row per canonical URL with the kept document
    and the variant count.

    Keep rule: highest ``quality_col`` (ties → lowest id), or lowest id
    when no quality column is given — the keep-best convention of
    ``dedup.keep_best_duplicates`` applied at URL granularity.

    Returns ``(url_norm, kept_id, n_variants)``. Plan: one map-stage
    normalization + ONE hash aggregation on the canonical key
    (map-side partial aggregation applies); nothing is collected,
    nothing is broadcast — linear at any corpus size.

    NULL and BLANK (empty/whitespace-only) ``url_col`` values are
    EXCLUDED — same rule as :func:`url_duplicates`. Neither carries any
    "same page" evidence (the WET parser emits null for a missing
    header; other ingests may emit ``""``), so grouping them would
    collapse every url-less document onto one arbitrary survivor — the
    r15 silent-drop class. Consumers that keep-join against ``kept_id``
    treat the excluded docs as automatic keepers instead (see
    ``cc_pipeline``), and the drop-list consumers
    (:func:`url_duplicate_drops`, :func:`url_drops_against`) never
    match them: a null key joins nothing, and a blank url's key is
    absent from the kept side.
    """
    key = normalize_url(F.col(url_col)).alias("url_norm")
    if quality_col is None:
        # min id == max over (-id): one min_by-shaped aggregate
        order = F.struct((-F.col(id_col)).alias("q"))
    else:
        order = F.struct(
            F.col(quality_col).alias("q"), (-F.col(id_col)).alias("tie")
        )
    # Both filters are expressed on the RAW column: every function in
    # the normalize_url chain (regexp_*, split/filter/array_*,
    # when/otherwise over them) is null-PRESERVING and never
    # null-INTRODUCING, so url_norm IS NULL ⟺ url IS NULL, and a
    # blank/whitespace-only url is detected by one btrim (explicit
    # whitespace set — plain trim() strips SPACES only in both Spark
    # and DuckDB) — cheap raw-column predicates the scan can evaluate
    # first. Filtering on url_norm itself (pre- OR post-aggregate) is a
    # trap: Catalyst pushes isnotnull(<group key expr>) through the
    # aggregate and below the Project, re-evaluating the whole regex
    # chain per row (observed as +30% on the bench row in both
    # placements).
    return (
        docs.where(
            F.col(url_col).isNotNull()
            & (F.btrim(F.col(url_col), F.lit(" \t\n\r\f\v")) != "")
        )
        .select(key, F.col(id_col), order.alias("_ord"))
        .groupBy("url_norm")
        .agg(
            F.max_by(id_col, F.col("_ord")).alias("kept_id"),
            F.count("*").alias("n_variants"),
        )
    )


def url_duplicate_drops(
    docs: DataFrame,
    id_col: str = "doc_id",
    url_col: str = "url",
    quality_col: str | None = None,
) -> DataFrame:
    """The drop list implied by :func:`url_dedup`: every document whose
    canonical URL lost the keep-best vote. Same single aggregation plus
    one shuffled join back on the canonical key (merge, not broadcast:
    the kept set is corpus-scaled — the round-13 audit rule)."""
    kept = url_dedup(docs, id_col, url_col, quality_col).select(
        "url_norm", "kept_id"
    )
    keyed = docs.select(
        normalize_url(F.col(url_col)).alias("url_norm"), F.col(id_col)
    )
    return (
        keyed.hint("merge")
        .join(kept, "url_norm")
        .where(F.col(id_col) != F.col("kept_id"))
        .select(id_col)
    )


def domain_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    url_col: str = "url",
    chars_col: str | None = None,
) -> DataFrame:
    """Per-domain corpus statistics — the aggregate a URL-filtering
    stage consults (RefinedWeb keeps/kills whole domains by these):
    document count, distinct canonical URLs, the implied URL-duplicate
    ratio, and mean document size when a size column exists.

    Returns ``(host, n_docs, n_urls, dup_ratio[, avg_chars])``.
    ONE hash aggregation keyed by host (count_distinct rewrites to a
    partial-aggregated expand under AQE); hosts are the natural
    partition key at crawl scale and skewed hosts are exactly what the
    stats exist to find, so no salting — the aggregate carries counts,
    not payloads.
    """
    base = docs.select(
        url_host(F.col(url_col)).alias("host"),
        normalize_url(F.col(url_col)).alias("url_norm"),
        *([F.col(chars_col)] if chars_col else []),
    )
    aggs = [
        F.count("*").alias("n_docs"),
        F.count_distinct(F.col("url_norm")).alias("n_urls"),
    ]
    if chars_col:
        aggs.append(F.avg(chars_col).alias("avg_chars"))
    out = base.groupBy("host").agg(*aggs)
    return out.withColumn(
        "dup_ratio",
        F.round(
            F.lit(1.0) - F.col("n_urls") / F.col("n_docs"), 6
        ),
    )


def persist_url_index(
    spark,
    docs: DataFrame,
    name: str,
    path: str,
    id_col: str = "doc_id",
    url_col: str = "url",
    quality_col: str | None = None,
    n_buckets: int = 64,
) -> DataFrame:
    """Materialize a crawl's URL-dedup state as ONE bucketed catalog
    table — the cross-crawl twin of :func:`url_dedup`, completing the
    ``persist_* / *_against`` family (MinHash, embeddings, fingerprints
    have theirs in ops/dedup.py / ops/ann.py).

    ``<name>_urls`` holds (url_norm, kept_id) — the keep-best winner
    per canonical key — bucketed by ``url_norm``, so every later
    crawl's probe join reads co-located buckets with NO corpus-side
    Exchange (write-once-shuffle-never; plan-asserted in
    tests/test_url.py). One hash aggregation + one shuffle at write
    time; RefinedWeb-style crawl-over-crawl URL filtering then never
    re-aggregates the old crawls.
    """
    from .util import persist_bucketed

    kept = url_dedup(docs, id_col, url_col, quality_col).select(
        "url_norm", "kept_id"
    )
    return persist_bucketed(
        spark, kept, f"{name}_urls", f"{path}_urls", n_buckets, "url_norm"
    )


def url_drops_against(
    new_docs: DataFrame,
    corpus_urls: DataFrame,
    id_col: str = "doc_id",
    url_col: str = "url",
    quality_col: str | None = None,
) -> DataFrame:
    """New-crawl documents to DROP under crawl-over-crawl URL dedup:
    (a) within-crawl keep-best losers (:func:`url_duplicate_drops`
    semantics), plus (b) the new crawl's per-key winners whose
    canonical URL ALREADY EXISTS in the persisted index — the earlier
    crawl keeps the page (RefinedWeb's "seen URL" rule: re-fetches of a
    known URL never enter the corpus).

    Returns one ``id_col`` row per dropped document. Plan: the new
    crawl normalizes and keep-best-aggregates map-side+one shuffle; the
    probe equi-join on ``url_norm`` reads the corpus index bucketed
    with no corpus-side Exchange; the loser join-back is merge-hinted
    (both sides crawl-scaled — the r13 audit rule).
    """
    kept = url_dedup(new_docs, id_col, url_col, quality_col).select(
        "url_norm", "kept_id"
    )
    keyed = new_docs.select(
        normalize_url(F.col(url_col)).alias("url_norm"), F.col(id_col)
    )
    within = (
        keyed.hint("merge")
        .join(kept, "url_norm")
        .where(F.col(id_col) != F.col("kept_id"))
        .select(id_col)
    )
    seen = (
        kept.hint("merge")
        .join(corpus_urls.select("url_norm"), "url_norm")
        .select(F.col("kept_id").alias(id_col))
    )
    return within.unionByName(seen)
