"""Bucketed-storage co-located joins: the 100 TB technique for repeated
joins on the same key (e.g. events⋈events or events⋈users on user_id).

Writing both sides bucketed by the join key into the catalog lets Spark
plan a SortMergeJoin with NO Exchange on either side — the shuffle is
paid once at write time, then every subsequent join is shuffle-free.
This is the Spark analogue of the reference keeping a partition's
journals co-resident on one node."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def bucketed_pair(spark, tmp_path_factory):
    # external tables with explicit paths — no warehouse conf needed
    # (spark.sql.warehouse.dir is static and can't change per-test)
    wh = str(tmp_path_factory.mktemp("warehouse"))
    left = spark.range(0, 1000).select(
        (F.col("id") % 50).alias("user_id"), F.col("id").alias("event_id")
    )
    right = spark.range(0, 50).select(
        F.col("id").alias("user_id"), F.concat(F.lit("u"), F.col("id")).alias("name")
    )
    for name, df in [("bk_events", left), ("bk_users", right)]:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.bucketBy(8, "user_id")
            .sortBy("user_id")
            .option("path", f"{wh}/{name}")
            .mode("overwrite")
            .saveAsTable(name)
        )
    yield spark.table("bk_events"), spark.table("bk_users")
    for name in ("bk_events", "bk_users"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    ev, users = bucketed_pair
    # defeat the broadcast path so the bucketed SMJ is what gets planned
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = ev.join(users, "user_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join must not shuffle"
        assert joined.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")


def test_bucketed_groupby_has_no_exchange(spark, bucketed_pair):
    ev, _ = bucketed_pair
    agg = ev.groupBy("user_id").agg(F.count("*").alias("n"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "aggregation on the bucket key must not shuffle"
    assert agg.count() == 50


def test_ivf_bucketed_corpus_probe_no_corpus_exchange(spark, tmp_path_factory):
    """The ANN analogue of write-once-shuffle-never: persist the corpus
    inverted-listed AND bucketed by centroid_id; a probe join on
    centroid_id then shuffles ONLY the query side — the corpus reads
    co-located buckets with no Exchange even when the probe set is too
    big to broadcast. Results are identical to the on-the-fly ivf_topk."""
    import os

    import pytest as _pytest

    from logrange_spark.ops import ann

    path = "/root/testdata/sf0.001/embeddings.parquet"
    if not os.path.isdir(path) and not os.path.exists(path):
        _pytest.skip("driver testdata not present")
    vecs = spark.read.parquet(path)
    queries = vecs.where(F.col("vec_id") < 5)
    cents = [
        (int(r[0]), list(r[1]))
        for r in vecs.where(F.col("vec_id") < 16)
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    ]
    wh = str(tmp_path_factory.mktemp("annwh"))
    spark.sql("DROP TABLE IF EXISTS bk_ann_corpus")
    try:
        table = ann.persist_ivf_corpus(
            spark, vecs, "bk_ann_corpus", f"{wh}/bk_ann_corpus", cents
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            # the probe-join fragment in isolation: bucketed corpus side
            # must contribute ZERO exchanges; the query side exactly one
            probe = queries.select(
                F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("qvec"),
                ann.ivf_assign_expr(F.col("embedding"), cents).alias("centroid_id"),
            )
            frag = table.join(probe, "centroid_id")
            plan = frag._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan
            assert plan.count("Exchange") == 1, plan
            assert "Bucketed: true" in plan

            got = ann.ivf_topk(
                None, queries, k=10, centroids=cents,
                assigned=table, broadcast_queries=False,
            ).collect()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
        want = ann.ivf_topk(vecs, queries, k=10, centroids=cents).collect()
        key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
        assert sorted(
            [(r["query_id"], r["rank"], r["neighbor_id"], r["score"]) for r in got]
        ) == sorted(
            [(r["query_id"], r["rank"], r["neighbor_id"], r["score"]) for r in want]
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS bk_ann_corpus")


def test_ivf_pq_bucketed_corpus_probe_no_corpus_exchange(spark, tmp_path_factory):
    """The full billion-scale serving layout: the persisted corpus is
    inverted-listed, PQ-coded (no raw embeddings in the table), and
    bucketed by centroid_id. A probe join shuffles only the query side;
    results are identical to the on-the-fly ivf_pq_topk."""
    import os

    import pytest as _pytest

    from logrange_spark.ops import ann

    path = "/root/testdata/sf0.001/embeddings.parquet"
    if not os.path.isdir(path) and not os.path.exists(path):
        _pytest.skip("driver testdata not present")
    vecs = spark.read.parquet(path)
    queries = vecs.where(F.col("vec_id") < 5)
    cents = [
        (int(r[0]), list(r[1]))
        for r in vecs.where(F.col("vec_id") < 16)
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    ]
    books = ann.pq_seed_codebooks(vecs)
    wh = str(tmp_path_factory.mktemp("annpqwh"))
    spark.sql("DROP TABLE IF EXISTS bk_annpq_corpus")
    try:
        table = ann.persist_ivf_pq_corpus(
            spark, vecs, "bk_annpq_corpus", f"{wh}/bk_annpq_corpus", cents, books
        )
        # the stored layout carries codes, never vectors
        assert set(table.columns) == {"neighbor_id", "centroid_id", "codes", "recon_norm"}
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            # probe-join fragment in isolation: the bucketed coded corpus
            # contributes ZERO exchanges, the query side exactly one
            probe = queries.select(
                F.col("vec_id").alias("query_id"),
                ann.ivf_assign_expr(F.col("embedding"), cents).alias("centroid_id"),
            )
            frag = table.join(probe, "centroid_id")
            fplan = frag._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in fplan
            assert fplan.count("Exchange") == 1, fplan
            assert "Bucketed: true" in fplan

            got = ann.ivf_pq_topk(
                None, queries, k=10, centroids=cents, codebooks=books,
                assigned=table, broadcast_queries=False,
            )
            plan = got._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan
            assert "Bucketed: true" in plan
            got_rows = got.collect()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
        want = ann.ivf_pq_topk(
            vecs, queries, k=10, centroids=cents, codebooks=books
        ).collect()
        assert sorted(
            (r["query_id"], r["rank"], r["neighbor_id"], r["score"]) for r in got_rows
        ) == sorted(
            (r["query_id"], r["rank"], r["neighbor_id"], r["score"]) for r in want
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS bk_annpq_corpus")


def test_incremental_dedup_against_persisted_corpus(spark, tmp_path_factory):
    """Continuous-ingestion dedup: the corpus' LSH bands persist ONCE
    bucketed by band_hash; a new shard's probe join reads co-located
    buckets with no corpus-side Exchange, and the found (new, corpus)
    near-dup pairs match a direct python Jaccard computation."""
    from logrange_spark.ops import dedup

    corpus_rows = [
        (i, f"the quick brown fox jumps over dog number {i} in field {i % 3}")
        for i in range(30)
    ] + [
        # boilerplate cluster: 4 identical copies — collapses to ONE
        # probe row per band, and matches must expand to every copy
        (50 + j, "standard legal boilerplate footer text shared verbatim")
        for j in range(4)
    ]
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    wh = str(tmp_path_factory.mktemp("incdedup"))
    for t in ("inc_corpus_bands", "inc_corpus_toks", "inc_corpus_members", "inc_corpus_ids"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    try:
        bands_t, toks_t, members_t, _ids_t = dedup.persist_corpus_lsh(
            spark, corpus, "inc_corpus", f"{wh}/inc_corpus"
        )
        # new shard: 100+i is a near-copy of corpus doc i (one word edit),
        # 200+ are novel
        new_rows = [
            (100 + i, corpus_rows[i][1].replace("jumps", "leaps")) for i in range(5)
        ] + [
            (200 + i, f"completely unrelated document about topic {i} alpha beta gamma delta")
            for i in range(5)
        ] + [
            # an exact copy of the corpus boilerplate: must match all 4
            (300, "standard legal boilerplate footer text shared verbatim"),
        ]
        new_df = spark.createDataFrame(new_rows, "doc_id long, text string")

        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            found = dedup.near_duplicates_against(
                new_df, bands_t, toks_t, members_t, threshold=0.7
            )
            plan = found._jdf.queryExecution().executedPlan().toString()
            assert "Bucketed: true" in plan
            rows = found.collect()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")

        # python reference: token-set jaccard for every (new, corpus) pair
        def toks(s):
            return set(s.lower().split())

        expect = set()
        for nid, ntext in new_rows:
            for cid, ctext in corpus_rows:
                a, b = toks(ntext), toks(ctext)
                if len(a & b) / len(a | b) >= 0.7:
                    expect.add((nid, cid))
        got = {(r["new_id"], r["corpus_id"]) for r in rows}
        # contract: PRECISION is exact (verification is exact token
        # Jaccard, so nothing below threshold may appear) and recall
        # covers the planted one-word near-copies (their shingle overlap
        # is high, so LSH banding finds them); incidental cross pairs
        # whose TOKEN jaccard clears the bar on low SHINGLE similarity
        # may legitimately be missed — that is MinHash-LSH's documented
        # probabilistic blocking, identical to self-dedup
        assert got <= expect, sorted(got - expect)
        assert all(r["jaccard"] >= 0.7 for r in rows)
        planted = {(100 + i, i) for i in range(5)}
        assert planted <= got, sorted(planted - got)
        # the boilerplate copy expands to every cluster member, jaccard 1.0
        assert {(300, 50 + j) for j in range(4)} <= got
        # novel docs never match anything
        assert all(nid < 200 or nid == 300 for nid, _ in got)

        # isolated probe fragment: corpus side contributes no Exchange
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            from logrange_spark.ops.dedup import (
                _signature_from_tokens, _token_frame, lsh_bands,
            )

            from logrange_spark.ops.dedup import _band_key

            nb = lsh_bands(
                _signature_from_tokens(_token_frame(new_df, "doc_id", "text"), "doc_id"),
                "doc_id",
            ).select(F.col("doc_id").alias("nid"), _band_key().alias("bkey"))
            frag = bands_t.join(nb, "bkey")
            fplan = frag._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in fplan
            # both exchanges belong to the PROBE side (the shard's spread()
            # repartition + its join shuffle); the bucketed corpus scan
            # feeds the join directly
            assert fplan.count("Exchange") == 2, fplan
            assert "Bucketed: true" in fplan
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
    finally:
        for t in ("inc_corpus_bands", "inc_corpus_toks", "inc_corpus_members", "inc_corpus_ids"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_incremental_embedding_dedup_against_persisted_corpus(spark, tmp_path_factory):
    """Embedding-side continuous-ingestion dedup (parity with the token
    path above): the corpus' collapsed rep vectors persist ONCE bucketed
    by sign bucket; a new shard's probe join reads co-located buckets
    with no corpus-side Exchange, precision is exact (cosine verified),
    and recall covers self-bucket + every one-bit signature flip —
    checked against a full brute-force cosine."""
    import math
    import random

    from logrange_spark.ops import ann

    rng = random.Random(9)

    def vec(seed_vec=None, jitter=0.0):
        if seed_vec is None:
            return [rng.uniform(-1, 1) for _ in range(16)]
        return [x + rng.uniform(-jitter, jitter) for x in seed_vec]

    base = [vec() for _ in range(40)]
    corpus_rows = [(i, [float(x) for x in base[i]]) for i in range(40)]
    # boilerplate cluster: 4 byte-identical vectors → ONE probe row
    boiler = [float(x) for x in vec()]
    corpus_rows += [(50 + j, boiler) for j in range(4)]
    corpus = spark.createDataFrame(corpus_rows, "vec_id long, embedding array<float>")

    wh = str(tmp_path_factory.mktemp("incemb"))
    for t in ("inc_emb_vecs", "inc_emb_members", "inc_emb_ids"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    try:
        vecs_t, members_t, _ids_t, dims = ann.persist_corpus_embeddings(
            spark, corpus, "inc_emb", f"{wh}/inc_emb", n_rows=len(corpus_rows)
        )
        # new shard: near-copies of corpus docs 0-4 (tiny jitter), novel
        # random vectors, and an exact copy of the boilerplate
        new_rows = [
            (100 + i, [float(x) for x in vec(base[i], 0.01)]) for i in range(5)
        ] + [(200 + i, [float(x) for x in vec()]) for i in range(5)]
        new_rows.append((300, boiler))
        new_df = spark.createDataFrame(new_rows, "vec_id long, embedding array<float>")

        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            found = ann.embedding_near_duplicates_against(
                new_df, vecs_t, members_t, dims, threshold=0.98
            )
            plan = found._jdf.queryExecution().executedPlan().toString()
            assert "Bucketed: true" in plan
            rows = found.collect()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")

        # brute-force reference (float32-rounded inputs)
        def cos(a, b):
            d = sum(x * y for x, y in zip(a, b))
            na = math.sqrt(sum(x * x for x in a))
            nb = math.sqrt(sum(x * x for x in b))
            return d / (na * nb)

        import struct

        def f32(v):
            return [struct.unpack("f", struct.pack("f", x))[0] for x in v]

        expect = set()
        for nid, nv in new_rows:
            for cid, cv in corpus_rows:
                if cos(f32(nv), f32(cv)) >= 0.9799995:  # rounding guard
                    expect.add((nid, cid))
        got = {(r["new_id"], r["corpus_id"]) for r in rows}
        # exact precision; recall guaranteed within Hamming ≤ 1
        assert got <= expect, sorted(got - expect)
        assert all(r["score"] >= 0.98 for r in rows)
        planted = {(100 + i, i) for i in range(5)}
        missing = planted - got
        # jittered copies should share signatures or differ by ≤1 bit —
        # all planted pairs must be found
        assert not missing, sorted(missing)
        # the boilerplate copy expands to every cluster member
        assert {(300, 50 + j) for j in range(4)} <= got
        # novel vectors never match
        assert all(not (200 <= nid < 300) for nid, _ in got)

        # corpus side contributes no Exchange: the only exchanges in the
        # probe plan belong to the shard side / expansion joins reading
        # the new frame, never the bucketed scans
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            probe_plan = ann.embedding_near_duplicates_against(
                new_df, vecs_t, members_t, dims, threshold=0.98
            )._jdf.queryExecution().executedPlan().toString()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
        assert probe_plan.count("Bucketed: true") >= 2, probe_plan
    finally:
        for t in ("inc_emb_vecs", "inc_emb_members", "inc_emb_ids"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_kn_model_persists_bucketed(spark, tmp_path):
    """The persisted KN model scores identically to the in-memory one,
    and the probe fragments read the model tables bucketed with every
    Exchange attributable to the EVENT side — the write-once-
    shuffle-never contract extended to n-gram LM scoring."""
    from logrange_spark.ops import text

    train = spark.createDataFrame(
        [(i, "the cat sat on the mat and the dog ran far " * (1 + i % 3))
         for i in range(40)],
        "doc_id long, text string")
    docs = spark.createDataFrame(
        [(0, "the cat sat on the mat"), (1, "dog unknown ran"), (2, "")],
        "doc_id long, text string")
    model = text.kn_bigram_lm(train)
    want = sorted(tuple(r) for r in text.kn_bigram_score(docs, model).collect())
    pm = text.persist_kn_model(spark, model, "knm_t", str(tmp_path / "knm"))
    got = sorted(tuple(r) for r in text.kn_bigram_score(docs, pm).collect())
    # the bucketed join reorders the per-doc mean's float summation —
    # identical up to reassociation ulps
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[:2] == w[:2]
        assert abs(g[2] - w[2]) < 1e-12 * max(1.0, abs(w[2]))
        assert abs(g[3] - w[3]) < 1e-12 * max(1.0, abs(w[3]))

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        big_t, ctx_t, cont_t = pm[0], pm[1], pm[2]
        ev = text._kn_events(docs, "doc_id", "text")
        for right, keys in ((big_t, ["u", "w"]), (ctx_t, ["u"]),
                            (cont_t, ["w"])):
            frag = ev.join(right, keys)
            fplan = frag._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in fplan, fplan
            assert "Bucketed: true" in fplan, fplan
            # the single Exchange is the event side's shuffle onto the
            # join keys; the bucketed model scan feeds the join directly
            assert fplan.count("Exchange") == 1, fplan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")


def test_kn_ngram_model_persists_bucketed_order5(spark, tmp_path):
    """CCNet's production filter shape — an order-5 KN LM — persisted
    with EVERY per-order probe table bucketed by its score-time join
    keys (counts[5..2] by the composite (ctx array, w), contexts[5..2]
    by ctx, continuation unigram by w: 9 tables, 4 distinct key
    shapes). Scores match the in-memory model, and no Exchange is
    attributable to the model side: the full score plan reads all 9
    scans bucketed, and each per-shape join fragment carries exactly
    the one event-side shuffle."""
    from logrange_spark.ops import text

    train = spark.createDataFrame(
        [(i, "the cat sat on the mat and the dog ran far away " *
          (1 + i % 3)) for i in range(40)],
        "doc_id long, text string")
    docs = spark.createDataFrame(
        [(0, "the cat sat on the mat"), (1, "dog unknown ran"), (2, "")],
        "doc_id long, text string")
    model = text.kn_ngram_lm(train, order=5)
    want = sorted(
        tuple(r) for r in text.kn_ngram_score(docs, model).collect())
    try:
        pm = text.persist_kn_ngram_model(
            spark, model, "knm5_t", str(tmp_path / "knm5"))
        got = sorted(
            tuple(r) for r in text.kn_ngram_score(docs, pm).collect())
        assert len(got) == len(want)
        for g, w in zip(got, want):
            assert g[:2] == w[:2]
            assert abs(g[2] - w[2]) < 1e-12 * max(1.0, abs(w[2]))
            assert abs(g[3] - w[3]) < 1e-12 * max(1.0, abs(w[3]))

        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            full = text.kn_ngram_score(docs, pm)
            fplan = full._jdf.queryExecution().executedPlan().toString()
            # 4 counts + 4 contexts + unigram = 9 bucketed model scans
            assert fplan.count("Bucketed: true") >= 9, fplan
            ev = text._kn_ngram_events(docs, "doc_id", "text", 5)
            for k in (5, 2):  # longest and shortest context shapes
                suf = F.slice(F.col("ctx"), 5 + 1 - k, k - 1)
                probe = ev.select(suf.alias("ctx"), "w")
                for right, keys in ((pm["counts"][k], ["ctx", "w"]),
                                    (pm["contexts"][k], ["ctx"])):
                    frag = probe.join(right, keys)
                    p = frag._jdf.queryExecution().executedPlan().toString()
                    assert "SortMergeJoin" in p, p
                    assert "Bucketed: true" in p, p
                    assert p.count("Exchange") == 1, p
            up = ev.join(pm["unigram"], ["w"])
            p = up._jdf.queryExecution().executedPlan().toString()
            assert "Bucketed: true" in p and p.count("Exchange") == 1, p
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
    finally:
        for k in (5, 4, 3, 2):
            spark.sql(f"DROP TABLE IF EXISTS knm5_t_counts{k}")
            spark.sql(f"DROP TABLE IF EXISTS knm5_t_contexts{k}")
        spark.sql("DROP TABLE IF EXISTS knm5_t_unigram")


def test_incremental_fingerprint_dedup_against_persisted_corpus(
    spark, tmp_path_factory
):
    """Cross-crawl fingerprint near-dup (VERDICT r13 #2): the corpus'
    64-bit simhashes persist ONCE banded+bucketed by the Hamming band
    key; a new crawl's probe join reads co-located buckets with no
    corpus-side Exchange, and the found (new, corpus) pairs equal a
    brute-force python Hamming sweep exactly (pigeonhole recall is a
    guarantee, not a probability)."""
    import random

    from logrange_spark.ops import dedup

    rng = random.Random(1407)
    corpus_fp = {}
    for i in range(40):
        corpus_fp[i] = rng.getrandbits(64)
    # boilerplate cluster: 4 docs share ONE fingerprint — collapses to
    # one probe row per band; matches must expand to every copy
    shared = rng.getrandbits(64)
    for j in range(4):
        corpus_fp[50 + j] = shared

    def flip(h, k):
        for b in rng.sample(range(64), k):
            h ^= 1 << b
        return h

    new_fp = {}
    for i in range(6):  # planted near-copies at hamming 0..3 of doc i
        new_fp[100 + i] = flip(corpus_fp[i], i % 4)
    new_fp[300] = shared          # exact copy of the cluster fingerprint
    new_fp[301] = flip(shared, 3)  # near-copy of the whole cluster
    for i in range(6):             # novel random fingerprints
        new_fp[200 + i] = rng.getrandbits(64)

    def to_signed(h):
        return h - (1 << 64) if h >= (1 << 63) else h

    corpus = spark.createDataFrame(
        [(i, to_signed(h)) for i, h in corpus_fp.items()],
        "doc_id long, simhash long",
    )
    new_df = spark.createDataFrame(
        [(i, to_signed(h)) for i, h in new_fp.items()],
        "doc_id long, simhash long",
    )
    wh = str(tmp_path_factory.mktemp("incfp"))
    for t in ("inc_fp_fps", "inc_fp_fp_members", "inc_fp_fp_ids"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    try:
        fps_t, members_t, ids_t = dedup.persist_corpus_fingerprints(
            spark, corpus, "inc_fp", f"{wh}/inc_fp", max_hamming=3
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            found = dedup.hamming_near_pairs_against(
                new_df, fps_t, members_t, max_hamming=3
            )
            fplan = found._jdf.queryExecution().executedPlan().toString()
            rows = found.collect()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")

        # brute-force twin: EXACT equality — banding is recall-lossless
        expect = {
            (nid, cid, bin(nh ^ ch).count("1"))
            for nid, nh in new_fp.items()
            for cid, ch in corpus_fp.items()
            if bin(nh ^ ch).count("1") <= 3
        }
        got = {(r["new_id"], r["corpus_id"], r["hamming"]) for r in rows}
        assert got == expect
        # planted structure sanity: each 100+i at hamming i%4; the exact
        # cluster copy expands to all 4 members at hamming 0
        assert {(300, 50 + j, 0) for j in range(4)} <= got
        assert {(301, 50 + j, 3) for j in range(4)} <= got

        # the corpus side reads bucketed with no Exchange of its own:
        # both persisted scans appear bucketed, and every Exchange in
        # the plan hashes probe-side frames (nh/bkey/new columns), never
        # re-shuffles a bucketed table
        assert fplan.count("Bucketed: true") >= 2, fplan
        assert "SortMergeJoin" in fplan, fplan
    finally:
        for t in ("inc_fp_fps", "inc_fp_fp_members", "inc_fp_fp_ids"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_streaming_band_insert_no_corpus_exchange(spark, tmp_path_factory):
    """r15 review finding #2: the streaming commit path's band-insert
    dedup must carry the SAME plan contract as the probe path — the
    persisted index side reads co-located buckets with no Exchange.
    ``novel_band_rows`` anti-joins the members table (bucketed by the
    join key ``h``), so the only Exchange in the plan hashes the
    BATCH side; anti-joining the fps table (bucketed by ``bkey``, the
    r15 code) shuffled + distinct'ed the entire index per micro-batch."""
    import random

    from logrange_spark.ops import dedup
    from logrange_spark.streaming.corpus_dedup import novel_band_rows

    rng = random.Random(2026)

    def to_signed(h):
        return h - (1 << 64) if h >= (1 << 63) else h

    corpus = spark.createDataFrame(
        [(i, to_signed(rng.getrandbits(64))) for i in range(200)],
        "doc_id long, simhash long",
    )
    wh = str(tmp_path_factory.mktemp("bandins"))
    for t in ("bi_fps", "bi_fp_members", "bi_fp_ids"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    try:
        fps_t, members_t, ids_t = dedup.persist_corpus_fingerprints(
            spark, corpus, "bi", f"{wh}/bi", max_hamming=3
        )
        h, _ = dedup._hamming_masked_and_bands(F.col("simhash"), 64, 3)
        batch = spark.createDataFrame(
            [(1000 + i, to_signed(rng.getrandbits(64))) for i in range(5)],
            "doc_id long, simhash long",
        ).select(F.col("doc_id"), h.alias("h"))

        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            bands = novel_band_rows(batch, members_t, 3)
            plan = bands._jdf.queryExecution().executedPlan().toString()
            n = bands.count()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")

        # 5 novel fingerprints × 4 pigeonhole bands
        assert n == 20, n
        # members scan is bucketed and contributes NO Exchange: every
        # Exchange sits on the BATCH branch of the anti-join (the ':'
        # continuation prefix in the tree print — the batch side pays
        # its distinct + the re-hash onto the 64-bucket layout; the
        # index side reads co-located buckets)
        assert "Bucketed: true" in plan, plan
        ex_lines = [l for l in plan.splitlines() if "Exchange" in l]
        assert ex_lines and all(":" in l for l in ex_lines), plan
        # regression tripwire: the fps table must not appear in the
        # commit-dedup plan at all (it was the r15 full-scan side)
        assert "bi_fps" not in plan, plan
    finally:
        for t in ("bi_fps", "bi_fp_members", "bi_fp_ids"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_streaming_replay_guard_no_corpus_exchange(
    spark, tmp_path_factory
):
    """r16: the commit path's id replay guard anti-joins the
    ``{name}_fp_ids`` sidecar — bucketed by the join key ``doc_id`` —
    so the corpus side reads co-located buckets with no Exchange.
    Guarding against the h-bucketed members table (the first r16 cut)
    shuffled the whole corpus-side table per micro-batch."""
    import random

    from logrange_spark.ops import dedup

    rng = random.Random(2027)

    def to_signed(h):
        return h - (1 << 64) if h >= (1 << 63) else h

    corpus = spark.createDataFrame(
        [(i, to_signed(rng.getrandbits(64))) for i in range(200)],
        "doc_id long, simhash long",
    )
    wh = str(tmp_path_factory.mktemp("guardids"))
    for t in ("gid_fps", "gid_fp_members", "gid_fp_ids"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    try:
        fps_t, members_t, ids_t = dedup.persist_corpus_fingerprints(
            spark, corpus, "gid", f"{wh}/gid", max_hamming=3
        )
        batch = spark.createDataFrame(
            # 5 novel ids + 2 already-committed (must be guarded out)
            [(1000 + i, to_signed(rng.getrandbits(64)))
             for i in range(5)]
            + [(7, to_signed(rng.getrandbits(64))),
               (11, to_signed(rng.getrandbits(64)))],
            "doc_id long, simhash long",
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            guarded = batch.join(
                ids_t.select(F.col("doc_id")), "doc_id", "left_anti"
            )
            plan = guarded._jdf.queryExecution().executedPlan().toString()
            ids = sorted(r["doc_id"] for r in guarded.collect())
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")

        assert ids == [1000, 1001, 1002, 1003, 1004]
        # the sidecar scan is bucketed and contributes NO Exchange:
        # every Exchange sits on the BATCH branch of the anti-join
        assert "Bucketed: true" in plan, plan
        ex_lines = [l for l in plan.splitlines() if "Exchange" in l]
        assert ex_lines and all(":" in l for l in ex_lines), plan
        # the guard must not touch members or fps at all
        assert "gid_fp_members" not in plan and "gid_fps" not in plan, (
            plan
        )
    finally:
        for t in ("gid_fps", "gid_fp_members", "gid_fp_ids"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
