"""URL normalization / URL-level dedup / domain stats (ops/url.py).

Each normalization rule gets a crafted case, the keep-best vote is
pinned, and a DuckDB twin recomputes the canonical key for a messy
batch so the Spark expression chain and the oracle SQL stay
byte-identical (the registry rows depend on that).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from logrange_spark.ops import url as U

CASES = [
    # (raw, canonical)
    ("https://www.Example.COM/page/7?z=2&id=7&utm_source=feed",
     "example.com/page/7?id=7&z=2"),
    ("http://example.com:80/page/7?id=7&z=2&gclid=g123",
     "example.com/page/7?id=7&z=2"),
    ("HTTPS://www.example.com/page/7/?z=2&id=7#frag",
     "example.com/page/7?id=7&z=2"),
    ("https://example.com:443/page/7?utm_campaign=x&id=7&z=2",
     "example.com/page/7?id=7&z=2"),
    # root path + trailing slash collapse
    ("https://example.com/", "example.com"),
    ("https://example.com", "example.com"),
    # fragment-only difference
    ("https://a.org/x#top", "a.org/x"),
    ("https://a.org/x", "a.org/x"),
    # query with only tracking params -> no '?'
    ("https://a.org/x?utm_medium=mail&fbclid=f1", "a.org/x"),
    # path/query case is PRESERVED
    ("https://A.org/X?Q=V", "a.org/X?Q=V"),
    # no scheme at all
    ("www.b.net/p?b=2&a=1", "b.net/p?a=1&b=2"),
    # msclkid stripped, empty params dropped
    ("https://b.net/p?msclkid=m&&a=1", "b.net/p?a=1"),
    # ref / ref_src stripped; 'reference' is NOT (exact-name rule)
    ("https://b.net/p?ref=tw&ref_src=x&reference=keep",
     "b.net/p?reference=keep"),
    # NON-default explicit port is a distinct resource and is KEPT
    ("https://example.com:8443/a", "example.com:8443/a"),
    ("http://Example.com:8080/a?b=1", "example.com:8080/a?b=1"),
    # both family defaults strip regardless of scheme (key is scheme-free)
    ("http://example.com:443/a", "example.com/a"),
    # tracking-param names match case-insensitively
    ("https://a.org/x?UTM_Source=mail&FBCLID=f1&Keep=1", "a.org/x?Keep=1"),
]


def test_normalize_url_cases(spark):
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _) in enumerate(CASES)], "i long, url string"
    )
    got = {
        r["i"]: r["n"]
        for r in df.select(
            "i", U.normalize_url(F.col("url")).alias("n")
        ).collect()
    }
    for i, (raw, want) in enumerate(CASES):
        assert got[i] == want, raw


def test_normalize_idempotent(spark):
    """Normalizing an already-canonical key is a no-op (the canon is
    scheme-free and sorted, so it is a fixed point)."""
    df = spark.createDataFrame(
        [(c,) for _, c in CASES], "url string"
    )
    rows = df.select(
        F.col("url"), U.normalize_url(F.col("url")).alias("n")
    ).collect()
    for r in rows:
        assert r["n"] == r["url"]


def test_url_host(spark):
    df = spark.createDataFrame(
        [("https://WWW.Foo.Org:8443/a?b=1#c",), ("foo.org/a",)],
        "url string",
    )
    hosts = [r["h"] for r in df.select(U.url_host(F.col("url")).alias("h")).collect()]
    assert hosts == ["foo.org", "foo.org"]


@pytest.fixture()
def messy(spark):
    rows = []
    for doc_id in range(40):
        pid = doc_id // 5
        v = doc_id % 5
        raw = [
            f"https://www.Example.COM/page/{pid}?z=2&id={pid}&utm_source=feed",
            f"http://example.com:80/page/{pid}?id={pid}&z=2&gclid=g{doc_id}",
            f"https://example.com/page/{pid}?utm_campaign=x&id={pid}&z=2#frag",
            f"https://blog.example.org/post/{doc_id}",
            f"HTTPS://www.example.com/page/{pid}/?z=2&id={pid}",
        ][v]
        rows.append((doc_id, raw, 100 + (doc_id % 7) * 10))
    return spark.createDataFrame(rows, "doc_id long, url string, n_chars long")


def test_url_dedup_keep_best(messy):
    out = {
        r["url_norm"]: (r["kept_id"], r["n_variants"])
        for r in U.url_dedup(messy, quality_col="n_chars").collect()
    }
    # each pid in 0..7 collapses variants {0,1,2,4 mod 5}; v3 is unique
    assert len(out) == 8 + 8
    for pid in range(8):
        ids = [pid * 5 + v for v in (0, 1, 2, 4)]
        best = max(ids, key=lambda i: (100 + (i % 7) * 10, -i))
        kept, n = out[f"example.com/page/{pid}?id={pid}&z=2"]
        assert n == 4
        assert kept == best
    for doc_id in range(3, 40, 5):
        kept, n = out[f"blog.example.org/post/{doc_id}"]
        assert (kept, n) == (doc_id, 1)


def test_url_dedup_default_keep_lowest_id(messy):
    out = {
        r["url_norm"]: r["kept_id"] for r in U.url_dedup(messy).collect()
    }
    for pid in range(8):
        assert out[f"example.com/page/{pid}?id={pid}&z=2"] == pid * 5


def test_url_duplicate_drops(messy):
    drops = {
        r["doc_id"]
        for r in U.url_duplicate_drops(messy, quality_col="n_chars").collect()
    }
    kept = {
        r["kept_id"]
        for r in U.url_dedup(messy, quality_col="n_chars").collect()
    }
    assert drops | kept == set(range(40))
    assert not (drops & kept)
    assert len(drops) == 8 * 3  # each page keeps 1 of 4 variants


def test_domain_stats(messy):
    out = {r["host"]: r for r in U.domain_stats(messy, chars_col="n_chars").collect()}
    assert set(out) == {"example.com", "blog.example.org"}
    ex = out["example.com"]
    assert (ex["n_docs"], ex["n_urls"]) == (32, 8)
    assert ex["dup_ratio"] == 0.75
    bl = out["blog.example.org"]
    assert (bl["n_docs"], bl["n_urls"], bl["dup_ratio"]) == (8, 8, 0.0)


def test_normalize_matches_duckdb_twin(spark):
    """The registry rows rely on the DuckDB normalization computing the
    identical canonical key — pin it on the crafted case set plus the
    messy fixture construction."""
    raws = [raw for raw, _ in CASES] + [
        f"https://www.Example.COM/page/{p}?z=2&id={p}&utm_source=feed"
        for p in range(5)
    ]
    df = spark.createDataFrame([(r,) for r in raws], "url string")
    got_spark = [
        r["n"]
        for r in df.select(U.normalize_url(F.col("url")).alias("n")).collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE u(url VARCHAR)")
    con.executemany("INSERT INTO u VALUES (?)", [(r,) for r in raws])
    got_duck = [
        r[0]
        for r in con.execute(
            f"SELECT {U.normalize_url_duckdb('url')} FROM u"
        ).fetchall()
    ]
    assert got_spark == got_duck


def test_url_index_cross_crawl(spark, tmp_path_factory, messy):
    """Crawl-over-crawl URL dedup: the first crawl's keep-best keys
    persist bucketed; the next crawl drops its within-crawl losers AND
    every winner whose canonical URL the index already holds — matching
    a brute-force python recomputation exactly — and the probe plan
    reads the index bucketed with no corpus-side Exchange."""
    wh = str(tmp_path_factory.mktemp("urlidx"))
    spark.sql("DROP TABLE IF EXISTS crawl0_urls")
    try:
        idx = U.persist_url_index(
            spark, messy, "crawl0", f"{wh}/crawl0", quality_col="n_chars"
        )
        # next crawl: re-fetches pages 0..3 under NEW cosmetic variants
        # (same canonical keys) + genuinely new pages 100..104, each
        # crawled twice (one tracking-param variant) so within-crawl
        # dedup has work
        rows = []
        for doc_id in range(1000, 1008):
            pid = doc_id % 4  # collides with crawl-0 page pid
            rows.append((doc_id,
                         f"http://Example.com/page/{pid}?id={pid}&z=2&utm_term=x"))
        for k in range(5):
            rows.append((2000 + 2 * k, f"https://example.com/new/{k}"))
            rows.append((2001 + 2 * k,
                         f"https://www.example.com/new/{k}?fbclid=f{k}"))
        new = spark.createDataFrame(rows, "doc_id long, url string")

        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            drops_df = U.url_drops_against(new, idx)
            plan = drops_df._jdf.queryExecution().executedPlan().toString()
            drops = {r["doc_id"] for r in drops_df.collect()}
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")

        # brute force: within-crawl keep-min per key, then drop winners
        # whose key appeared in crawl 0
        import collections

        keys = {
            r["doc_id"]: r["n"]
            for r in new.select(
                "doc_id", U.normalize_url(F.col("url")).alias("n")
            ).collect()
        }
        crawl0_keys = {r["url_norm"] for r in idx.collect()}
        by_key = collections.defaultdict(list)
        for d, k in keys.items():
            by_key[k].append(d)
        expect = set()
        for k, ids in by_key.items():
            ids = sorted(ids)
            expect.update(ids[1:])              # within-crawl losers
            if k in crawl0_keys:
                expect.add(ids[0])              # seen-URL winners drop too
        assert drops == expect
        # the 8 re-fetches collapse to 4 keys, all seen → all 8 drop;
        # each new page keeps exactly one of its two variants
        assert {d for d in drops if d >= 2000} == {2001 + 2 * k for k in range(5)}
        assert all(1000 + i in drops for i in range(8))
        assert "Bucketed: true" in plan, plan
    finally:
        spark.sql("DROP TABLE IF EXISTS crawl0_urls")


def test_url_dedup_null_urls_are_not_grouped(spark):
    """NULL canonical keys must NOT form a dedup group: a null URL
    carries no same-page evidence, so url-less docs are all automatic
    keepers — never collapsed onto one survivor, never in a drop list
    (the r14 verdict's silent-data-loss defect)."""
    rows = [
        (1, "https://a.org/x?utm_source=f"),
        (2, "https://www.a.org/x"),  # dup of 1
        (3, None),
        (4, None),
        (5, None),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, url string")
    out = U.url_dedup(docs).collect()
    # one group (a.org/x) — no null-key group at all
    assert {r["url_norm"] for r in out} == {"a.org/x"}
    assert out[0]["kept_id"] == 1 and out[0]["n_variants"] == 2
    # drop list: only the real duplicate; every null-URL doc survives
    drops = {r["doc_id"] for r in U.url_duplicate_drops(docs).collect()}
    assert drops == {2}
    # DuckDB twin in lockstep: same WHERE guard
    import duckdb as _dd

    con = _dd.connect()
    con.execute(
        "CREATE TABLE d AS SELECT * FROM (VALUES "
        "(1, 'https://a.org/x?utm_source=f'), (2, 'https://www.a.org/x'), "
        "(3, NULL), (4, NULL), (5, NULL)) t(doc_id, url)"
    )
    twin = con.execute(
        f"""
        SELECT url_norm, min(doc_id) AS kept_id, count(*) AS nv FROM
          (SELECT doc_id, {U.normalize_url_duckdb('url')} AS url_norm FROM d)
        WHERE url_norm IS NOT NULL GROUP BY url_norm
        """
    ).fetchall()
    assert twin == [("a.org/x", 1, 2)]


def test_url_drops_against_null_urls_survive(spark):
    """Cross-crawl URL filtering: null-URL docs in the new crawl are
    never dropped, even when the corpus index is non-empty."""
    corpus = spark.createDataFrame(
        [("a.org/x", 10)], "url_norm string, kept_id long"
    )
    new = spark.createDataFrame(
        [(1, "http://a.org/x"), (2, None), (3, None)],
        "doc_id long, url string",
    )
    drops = {r["doc_id"] for r in U.url_drops_against(new, corpus).collect()}
    assert drops == {1}  # seen URL dropped; null-URL docs survive


def test_url_dedup_blank_urls_are_not_grouped(spark):
    """r15 review: a non-null but BLANK/whitespace-only URL normalizes
    to a non-null key, so without the trim guard every such doc would
    collapse onto one arbitrary survivor — the same silent-drop class
    as null keys. Blank-URL docs must be automatic keepers, in the op
    AND in lockstep with the DuckDB twin's guard."""
    rows = [
        (1, "https://a.org/x?utm_source=f"),
        (2, "https://www.a.org/x"),  # dup of 1
        (3, ""),
        (4, "   "),
        (5, "\t"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, url string")
    out = U.url_dedup(docs).collect()
    assert {r["url_norm"] for r in out} == {"a.org/x"}
    assert out[0]["kept_id"] == 1 and out[0]["n_variants"] == 2
    drops = {r["doc_id"] for r in U.url_duplicate_drops(docs).collect()}
    assert drops == {2}
    # DuckDB twin in lockstep: same raw-column guard
    import duckdb as _dd

    con = _dd.connect()
    con.execute(
        "CREATE TABLE d AS SELECT * FROM (VALUES "
        "(1, 'https://a.org/x?utm_source=f'), (2, 'https://www.a.org/x'), "
        "(3, ''), (4, '   '), (5, chr(9))) t(doc_id, url)"
    )
    twin = con.execute(
        f"""
        SELECT url_norm, min(doc_id) AS kept_id, count(*) AS nv FROM
          (SELECT doc_id, {U.normalize_url_duckdb('url')} AS url_norm
           FROM d WHERE url IS NOT NULL AND trim(url,
             ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)
           ) <> '')
        GROUP BY url_norm
        """
    ).fetchall()
    assert twin == [("a.org/x", 1, 2)]
