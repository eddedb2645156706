"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``      — brute-force exact top-k: broadcast the (small)
                         query set against the corpus; one shuffle for the
                         per-query top-k (window + filter). The baseline.
- ``bucketed_topk``    — sign-LSH bucketed variant: corpus and queries are
                         bucketed by the sign pattern of the leading
                         dimensions; candidate scoring happens only within
                         a bucket (equi-join on bucket id). The scale path:
                         at 100 TB the bucket id becomes the table's
                         partition key, so a query touches one partition.
- ``embedding_near_duplicates`` — near-dup pairs by cosine within buckets.

All math is float→double elementwise multiply + left-fold sum (built-in
higher-order functions, JVM-side) — deterministic and portable, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ANN_BUCKET_DIMS = 8  # floor: sign bits of the first 8 dims → 256 buckets
ANN_MAX_BUCKET_DIMS = 24  # cap: 2^24 ≈ 16.7M buckets
ANN_TARGET_OCCUPANCY = 8  # expected rows per bucket the blocking aims for


def bucket_dims(
    n_rows: int,
    target: int = ANN_TARGET_OCCUPANCY,
    lo: int = ANN_BUCKET_DIMS,
    hi: int = ANN_MAX_BUCKET_DIMS,
) -> int:
    """Occupancy-bounded sign-bit count: ceil(log2(n / target)), clamped.

    A FIXED bucket count makes within-bucket pair work grow quadratically
    with the corpus (the round-5 scale proof measured 5.5x wall at 10x
    rows); deriving the bit count from the corpus size keeps expected
    occupancy ~``target`` regardless of scale, so blocked pair work grows
    ~linearly (n * target per side). At 10^9 vectors the formula gives the
    24-bit cap → ~60 rows/bucket. The formula is plain ceil/log2 so the
    DuckDB oracle can compute the identical value in SQL from count(*).

    Recall note: more sign bits means a single exact-bucket probe misses
    more true neighbors, which is why every consumer below pairs this
    with Hamming-1 multi-probe (self bucket + each one-bit flip).
    """
    import math

    need = math.ceil(math.log2(max(1.0, n_rows / float(target))))
    return max(lo, min(hi, need))


def _default_nrows(df: DataFrame) -> int:
    """Corpus row count for occupancy sizing, WITHOUT a Spark job when
    the frame is file-backed: sums the parquet footer counts of the
    frame's input files — exact for a bare table scan (the only shape the
    registered queries use), an upper bound if the caller filtered the
    frame (occupancy sizing tolerates an upper bound; pass ``n_rows``
    explicitly for heavily filtered corpora, or when the file listing
    itself is large enough to matter — at catalog scale the table stats
    belong to the caller anyway). Falls back to ``count()`` for
    in-memory frames and non-local filesystems."""
    try:
        files = df.inputFiles()
    except Exception:
        files = []
    if files and all(f.split("?")[0].endswith(".parquet") for f in files):
        try:
            from urllib.parse import unquote, urlparse

            import pyarrow.parquet as papq

            total = 0
            for f in files:
                p = urlparse(f)
                if p.scheme not in ("file", ""):
                    raise ValueError(f"non-local file {f}")
                total += papq.ParquetFile(unquote(p.path)).metadata.num_rows
            return total
        except Exception:
            pass
    return df.count()


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def _dot_sql(a: str, b: str) -> str:
    """SQL-string twin of ``_dot`` — the embedding dedup hot path builds
    its projections via selectExpr (one parsed round-trip instead of
    dozens of higher-order-function Column calls per expression; value
    equivalence pinned by the dedup_embedding oracle row). 0.0D keeps
    the accumulator a double, exactly like F.lit(0.0)."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * "
        f"cast(y as double)), 0.0D, (acc, x) -> acc + x)"
    )


def _norm_sql(a: str) -> str:
    return f"sqrt({_dot_sql(a, a)})"


def _sign_bucket_sql(a: str, dims: int) -> str:
    """SQL-string twin of ``sign_bucket``."""
    if dims <= 0:
        return "cast(0 as int)"
    body = " + ".join(
        f"if(try_element_at({a}, {i + 1}) > 0, {1 << i}, 0)" for i in range(dims)
    )
    return f"cast({body} as int)"


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def sign_bucket(a: Column, dims: int = ANN_BUCKET_DIMS) -> Column:
    """Axis-aligned sign-LSH bucket id: Σ (a[i] > 0) << i for i < dims."""
    out = F.lit(0)
    for i in range(dims):
        # try_element_at: vectors shorter than ``dims`` contribute 0 bits
        out = out + F.when(F.try_element_at(a, F.lit(i + 1)) > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return out.cast("int")


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query (excluding self)."""
    from pyspark.sql.window import Window

    # norms are projected per ROW before the join — cosine() inline would
    # re-fold both vector norms per candidate PAIR, tripling the dominant
    # per-pair element work (same fold, so scores are bit-identical)
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qvec"),
            _norm(F.col(vec_col)).alias("_qn"),
        )
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        _norm(F.col(vec_col)).alias("_cn"),
    )
    scored = (
        q.crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot(F.col("qvec"), F.col("cvec")) / (F.col("_qn") * F.col("_cn")), 6
            ).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def _probe_buckets(bucket: Column, dims: int) -> Column:
    """The Hamming-1 probe set: the bucket itself plus each one-bit flip.

    Multi-probe is the standard recall repair for LSH at high bit counts
    (probe neighboring buckets instead of growing tables): a corpus vector
    lives in exactly ONE bucket, so the dims+1 distinct probe buckets
    produce each (query, neighbor) candidate at most once — no dedup step
    needed after the join.
    """
    return F.array(
        bucket, *[bucket.bitwiseXOR(F.lit(1 << i)) for i in range(dims)]
    )


def bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_rows: int | None = None,
    dims: int | None = None,
    multi_probe: bool = True,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's sign bucket
    and (multi_probe) its Hamming-1 neighbor buckets.

    The bit count is occupancy-bounded (``bucket_dims``): pass ``n_rows``
    (e.g. from table stats) to skip the count job, or ``dims`` to pin the
    blocking exactly.

    Recall bars (tests/test_ops.py): for planted near-duplicate queries —
    the operator's use case — multi-probe recall@1 is asserted >= 0.9 at
    default dims and >= 0.85 at dims=12. On NEAR-RANDOM vectors recall@10
    is inherently low (per-bit collision probability ^ bit count; ~0.12
    measured with multi-probe vs ~0.03 single) — that floor is pinned by
    a test too; random-vector workloads should use ``ivf_topk``.
    """
    from pyspark.sql.window import Window

    if dims is None:
        dims = bucket_dims(n_rows if n_rows is not None else _default_nrows(corpus))
    # norms projected per row, not per pair (see cosine_topk)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        _norm(F.col(vec_col)).alias("_cn"),
        sign_bucket(F.col(vec_col), dims).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        _norm(F.col(vec_col)).alias("_qn"),
        sign_bucket(F.col(vec_col), dims).alias("bucket"),
    )
    if multi_probe:
        q = q.select(
            "query_id",
            "qvec",
            "_qn",
            F.explode(_probe_buckets(F.col("bucket"), dims)).alias("bucket"),
        )
    scored = (
        F.broadcast(q).join(c, "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot(F.col("qvec"), F.col("cvec")) / (F.col("_qn") * F.col("_cn")), 6
            ).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


IVF_CENTROIDS = 16
IVF_PROBE = 4


def _centroid_norm(cv: list[float]) -> float:
    # plain left-fold, NOT math.fsum: must reproduce the oracle's
    # list_reduce double-addition order bit-for-bit
    s = 0.0
    for x in cv:
        s += float(x) * float(x)
    import math

    return math.sqrt(s)


def ivf_assign_expr(
    vec: Column, cents: list[tuple[int, list[float]]], norm: Column | None = None
) -> Column:
    """Nearest-centroid id for ``vec`` (cosine; ties → smaller id).

    ``cents`` are driver-side (cid, vector) pairs embedded as literals, so
    assignment is a pure per-row expression — a map stage with NO shuffle,
    which is what real IVF assignment looks like at 100 TB (centroids are
    always small enough to ship with the plan). Pass a pre-projected
    ``norm`` column to avoid re-inlining the vector norm per centroid.
    """
    norm = norm if norm is not None else _norm(vec)
    # one dot expression in the plan, applied to every centroid inside a
    # zip_with lambda over the literal centroid array (vs n_centroids
    # unrolled copies — the PQ compile-wall fix, see pq_encode_expr).
    # Sorted by cid so first-max-position == smallest tied cid, matching
    # the struct-max idiom this replaces.
    cs = sorted(cents)
    cvecs = F.array(*[F.array(*[F.lit(float(x)) for x in cv]) for _, cv in cs])
    cnorms = F.array(*[F.lit(_centroid_norm(cv)) for _, cv in cs])
    cids = F.array(*[F.lit(int(cid)) for cid, _ in cs])
    scores = F.zip_with(cvecs, cnorms, lambda cv, cn: _dot(vec, cv) / (norm * cn))
    return F.element_at(cids, F.array_position(scores, F.array_max(scores)).cast("int")).cast("int")


def ivf_train_centroids(
    corpus: DataFrame,
    n_centroids: int = IVF_CENTROIDS,
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 10,
) -> list[tuple[int, list[float]]]:
    """K-means-trained IVF centroids via Spark MLlib (the production
    quantizer; the deterministic lowest-id seeding in ``ivf_topk`` exists
    for cross-engine oracle checks — training only changes the centroid
    constants, never the plan shape). Deterministic for a fixed seed.

    MLlib's fit is itself a distributed Spark job (k-means|| init +
    Lloyd iterations), so training scales with the corpus; the returned
    centroids are driver-side constants shipped with the query plan,
    exactly like the seeded ones.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = corpus.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    )
    model = KMeans(k=n_centroids, seed=seed, maxIter=max_iter).fit(feat)
    return [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())]


def ivf_assigned_corpus(
    corpus: DataFrame,
    cents: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assign: str = "expr",
) -> DataFrame:
    """(neighbor_id, cvec, centroid_id): the corpus inverted-listed by
    nearest centroid — a pure map stage either way. ``assign="expr"``
    (default) ships the centroids as plan literals (bit-exact with the
    oracle twins; right for small k); ``assign="numpy"`` runs the
    Arrow-batched matmul of ``assign_centroids_np`` — the only feasible
    shape at production IVF scale (k ~ sqrt(n), far past what a literal
    plan or interpreted HOF evaluation carries; same tie-break, csim may
    differ in final ulps). The numpy path leaves zero vectors with a
    NULL centroid_id (the expr path expects callers to pre-filter
    them); cnorm is JVM-computed on both paths for bit-identical
    probe-time scoring."""
    pre = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        _norm(F.col(vec_col)).alias("_vn"),
    )
    # cnorm is persisted with the inverted list so probe-time scoring
    # never re-folds the corpus vector's norm per candidate pair
    if assign == "numpy":
        return assign_centroids_np(
            pre, cents, id_col="neighbor_id", vec_col="cvec"
        ).select(
            "neighbor_id",
            "cvec",
            F.col("_vn").alias("cnorm"),
            F.col("_cid").alias("centroid_id"),
        )
    return pre.select(
        "neighbor_id",
        "cvec",
        F.col("_vn").alias("cnorm"),
        ivf_assign_expr(F.col("cvec"), cents, norm=F.col("_vn")).alias("centroid_id"),
    )


def persist_ivf_corpus(
    spark,
    corpus: DataFrame,
    name: str,
    path: str,
    centroids: list[tuple[int, list[float]]],
    n_buckets: int = IVF_CENTROIDS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Materialize the IVF-assigned corpus as a table BUCKETED by
    centroid_id: the one shuffle is paid at write time, after which every
    probe join on centroid_id reads co-located buckets with NO Exchange
    on the corpus side (plan-asserted in tests/test_bucketing.py). This
    is the 100 TB shape: the corpus table is written once, queries only
    ever shuffle their (small) probe set.
    """
    assigned = ivf_assigned_corpus(corpus, centroids, id_col, vec_col)
    return _persist_bucketed(spark, assigned, name, path, n_buckets)


def ivf_topk(
    corpus: DataFrame | None,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = IVF_CENTROIDS,
    n_probe: int = IVF_PROBE,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[tuple[int, list[float]]] | None = None,
    assigned: DataFrame | None = None,
    broadcast_queries: bool = True,
) -> DataFrame:
    """IVF-style approximate top-k: corpus vectors are inverted-listed by
    nearest centroid; each query probes its ``n_probe`` nearest lists.

    Centroid seeding is deterministic (the ``n_centroids`` lowest-id
    corpus vectors) so results are oracle-checkable; production would
    k-means iterate, which only changes the centroid constants. Plan
    shape: assignment = shuffle-free map (literal centroids), probe =
    broadcast join on centroid id, scoring = broadcast join, final top-k
    = window over the (small) candidate set. At scale the centroid id is
    the natural partition/bucket key for the corpus table — pass
    ``assigned`` (from ``persist_ivf_corpus``) to probe a pre-bucketed
    corpus, and ``broadcast_queries=False`` when the probe set is too big
    to broadcast (the bucketed corpus side still joins with no Exchange).
    """
    from pyspark.sql.window import Window

    cents = centroids if centroids is not None else [
        (int(r[0]), list(r[1]))
        for r in (
            corpus.where(F.col(id_col) < n_centroids)
            .select(id_col, vec_col)
            .orderBy(id_col)
            .collect()
        )
    ]

    if assigned is None:
        assigned = ivf_assigned_corpus(corpus, cents, id_col, vec_col)

    qpre = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        _norm(F.col(vec_col)).alias("_qn"),
    )
    qw = Window.partitionBy("query_id").orderBy(
        F.col("pscore").desc(), F.col("centroid_id")
    )
    qp = (
        qpre.select(
            "query_id",
            "qvec",
            "_qn",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(cid).alias("centroid_id"),
                            (
                                _dot(F.col("qvec"), F.array(*[F.lit(float(x)) for x in cv]))
                                / (F.col("_qn") * F.lit(_centroid_norm(cv)))
                            ).alias("pscore"),
                        )
                        for cid, cv in cents
                    ]
                )
            ).alias("pc"),
        )
        .select("query_id", "qvec", "_qn", F.col("pc.centroid_id").alias("centroid_id"),
                F.col("pc.pscore").alias("pscore"))
        .withColumn("prank", F.row_number().over(qw))
        .where(F.col("prank") <= n_probe)
        .select("query_id", "qvec", F.col("_qn").alias("qnorm"), "centroid_id")
    )

    scored = (
        assigned.join(F.broadcast(qp) if broadcast_queries else qp, "centroid_id")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot(F.col("qvec"), F.col("cvec"))
                / (F.col("qnorm") * F.col("cnorm")),
                6,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def _emb_collapse(
    df: DataFrame, id_col: str, vec_col: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Exact-collapse state shared by the embedding dedup family:
    (reps, members, dup_keys).

    The collapse key is TWO independently-seeded xxhash64 passes over
    the raw array (`_emb_vkey`) — JVM-side integer hashing, 128
    effective bits (chance of ANY false merge across a 10¹²-vector
    corpus ~10⁻¹⁴, the same epistemic footing as the md5 digest it
    replaced, without the per-row string materialization of the whole
    vector). ``reps`` is one row (min id) per distinct vector plus the
    cluster size; ``members`` stays a narrow projection of the scan (no
    shuffle until a consumer joins it); ``dup_keys`` lists multi-member
    clusters for the within-cluster prefilter."""
    keyed = df.selectExpr(
        id_col,
        vec_col,
        f"struct(xxhash64({vec_col}) AS h1, xxhash64(1, {vec_col}) AS h2)"
        " AS _vkey",
    )
    # materialized once (lazy localCheckpoint, r16): reps feeds both
    # bucket-join sides, the self-score, and dup_keys — without the
    # checkpoint each consumer re-ran the scan+hash+collapse whenever
    # exchange reuse missed (same finding as dedup._rep_pairs_and_
    # members)
    reps = keyed.groupBy("_vkey").agg(
        F.min(id_col).alias(id_col),
        F.count(F.lit(1)).alias("_csz"),
        F.first(vec_col).alias(vec_col),
    ).localCheckpoint(eager=False)
    dup_keys = reps.where(F.col("_csz") >= 2).select("_vkey", "_csz")
    members = keyed.select("_vkey", F.col(id_col))
    return reps, members, dup_keys


def _emb_rep_pairs(
    reps: DataFrame,
    id_col: str,
    vec_col: str,
    dims: int,
    threshold: float,
    multi_probe: bool,
) -> DataFrame:
    """Verified (id_a, id_b, _ka, _kb, score) pairs among the collapsed
    REPRESENTATIVES via the occupancy-bounded sign-bucket join.

    UPWARD-only probing when ``multi_probe``: pair-finding is symmetric,
    so for a pair whose signatures differ in bit j only the side with
    the 0-bit needs to probe the flip (the other side is reached via
    its self bucket). Flipping a 0-bit always RAISES the bucket id, so
    "flips ≥ own bucket" selects exactly those probes — halving probe
    rows with the identical output pair set. Match accounting: equal
    signatures meet only via self-probe (id< dedups); signatures
    differing in bit j meet only via the 0-bit side's j-flip (id!=
    suffices, least/greatest orders the output); Hamming≥2 pairs never
    meet."""
    # norm projected per row, not per pair (see cosine_topk); built as
    # parsed SQL projections (see _dot_sql) — plan-construction cost
    b = reps.selectExpr(
        id_col,
        "_vkey",
        vec_col,
        f"{_norm_sql(vec_col)} AS _n",
        f"{_sign_bucket_sql(vec_col, dims)} AS bucket",
    )
    if multi_probe:
        probes = "array(" + ", ".join(
            ["bucket"] + [f"bucket ^ {1 << i}" for i in range(dims)]
        ) + ")"
        l = b.selectExpr(
            id_col,
            "_vkey",
            vec_col,
            "_n",
            "bucket AS own",
            f"explode(filter({probes}, p -> p >= bucket)) AS bucket",
        ).alias("l")
        pair_cond = F.when(
            F.col("l.own") == F.col("l.bucket"),
            F.col(f"l.{id_col}") < F.col(f"r.{id_col}"),
        ).otherwise(F.col(f"l.{id_col}") != F.col(f"r.{id_col}"))
    else:
        l = b.alias("l")
        pair_cond = F.col(f"l.{id_col}") < F.col(f"r.{id_col}")
    r = b.alias("r")
    # merge hint: both sides are the distinct-vector reps frame
    # (aggregate-derived, data-scaled) — same contract as the token
    # path's band self-join; SMJ also reuses the shared rep exchange
    # instead of recomputing the signature map for the broadcast side
    return (
        l.hint("merge")
        .join(r, (F.col("l.bucket") == F.col("r.bucket")) & pair_cond)
        .select(
            F.least(F.col(f"l.{id_col}"), F.col(f"r.{id_col}")).alias("id_a"),
            F.greatest(F.col(f"l.{id_col}"), F.col(f"r.{id_col}")).alias("id_b"),
            # the cluster keys follow their ids through least/greatest
            F.when(
                F.col(f"l.{id_col}") < F.col(f"r.{id_col}"), F.col("l._vkey")
            ).otherwise(F.col("r._vkey")).alias("_ka"),
            F.when(
                F.col(f"l.{id_col}") < F.col(f"r.{id_col}"), F.col("r._vkey")
            ).otherwise(F.col("l._vkey")).alias("_kb"),
            # try_divide: a zero-norm vector has no cosine — null score
            # never clears the threshold (ANSI mode would otherwise
            # raise DIVIDE_BY_ZERO on degenerate inputs)
            F.round(
                F.try_divide(
                    F.expr(_dot_sql(f"l.{vec_col}", f"r.{vec_col}")),
                    F.col("l._n") * F.col("r._n"),
                ),
                6,
            ).alias("score"),
        )
        .where(F.col("score") >= threshold)
    )


def embedding_near_duplicates(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_rows: int | None = None,
    dims: int | None = None,
    multi_probe: bool = True,
) -> DataFrame:
    """Near-duplicate pairs (cosine ≥ threshold) within sign-LSH blocks.

    Blocking is occupancy-bounded (``bucket_dims``), so blocked pair work
    grows ~linearly with the corpus instead of quadratically; with
    ``multi_probe`` the left side probes its bucket plus each one-bit
    flip, so pairs whose sign signatures differ in at most ONE bit are
    found. Each such pair is emitted exactly once: equal signatures match
    only via the self-probe, and signatures differing in bit j match only
    via the left row's j-flip — so no distinct is needed and the join
    stays a plain equi-join on bucket id.
    """
    if dims is None:
        dims = bucket_dims(n_rows if n_rows is not None else _default_nrows(df))
    # Exact-collapse skew hardening (mirrors ops/dedup._rep_pairs_and_
    # members): VALUE-identical vectors — duplicate documents produce
    # duplicate embeddings — all land in the same sign bucket no matter
    # how many occupancy bits `bucket_dims` adds, so a k-copy cluster
    # would put k rows in one bucket and O(k²) pair work in one task.
    # One representative (min id) per distinct vector enters the bucket
    # join (`_emb_collapse`); member pairs are re-expanded afterward
    # with the IDENTICAL output: identical vectors share the signature
    # (same matches), the norm, and every pairwise dot, and the
    # within-cluster score is the rep's own self-score expression (not a
    # literal 1.0 — the float fold of dot(v,v)/(‖v‖·‖v‖) is reproduced
    # exactly).
    reps, members, dup_keys = _emb_collapse(df, id_col, vec_col)
    rep_pairs = _emb_rep_pairs(
        reps, id_col, vec_col, dims, threshold, multi_probe
    )
    # expansion: cross-cluster member pairs inherit the rep score; the
    # within-cluster pairs use the rep's self-score (same fold as the
    # direct pair would compute) and are generated by the same grid-
    # salted self-join as the token dedup path — output-inherent O(k²),
    # never one task
    from .dedup import _salted_self_sides

    ma = members.select(F.col("_vkey").alias("_ka"), F.col(id_col).alias("_fa"))
    mb = members.select(F.col("_vkey").alias("_kb"), F.col(id_col).alias("_fb"))
    # merge hints (round 13, suite-wide broadcast audit): rep_pairs is
    # PAIR-VOLUME-scaled and its size estimate is join-derived — AQE
    # would broadcast it at any scale (the repeated_spans x100 lesson)
    cross = (
        rep_pairs.hint("merge").join(ma, "_ka")
        .hint("merge").join(mb, "_kb")
        .select(
            F.least("_fa", "_fb").alias("id_a"),
            F.greatest("_fa", "_fb").alias("id_b"),
            "score",
        )
    )
    selfscore = reps.selectExpr(
        "_vkey",
        f"round(try_divide({_dot_sql(vec_col, vec_col)}, "
        f"{_norm_sql(vec_col)} * {_norm_sql(vec_col)}), 6) AS _selfscore",
    ).where(F.col("_selfscore") >= threshold)
    # pre-filter the within side to multi-member clusters (the count is
    # free at the collapse agg): duplicate-light corpora pay ~nothing.
    # The carried _csz makes the salting window-free. merge hints: both
    # dup_keys and selfscore are aggregate-derived and DATA-scaled
    # (distinct-vector count), so their size estimates undershoot — an
    # estimate-driven broadcast dies at a duplicate-heavy 100 TB corpus
    # (suite-wide broadcast audit, round 13).
    dup_members = members.hint("merge").join(dup_keys, "_vkey")
    wl, wr = _salted_self_sides(dup_members, ["_vkey"], id_col,
                                size_col="_csz")
    within = (
        wl.alias("wl").hint("merge")
        .join(
            wr.alias("wr"),
            (F.col("wl._vkey") == F.col("wr._vkey"))
            & (F.col("wl._gi") == F.col("wr._gi"))
            & (F.col("wl._gj") == F.col("wr._gj"))
            & (F.col(f"wl.{id_col}") < F.col(f"wr.{id_col}")),
        )
        .hint("merge")
        .join(selfscore.withColumnRenamed("_vkey", "_wk"),
              F.col("wl._vkey") == F.col("_wk"))
        .select(
            F.col(f"wl.{id_col}").alias("id_a"),
            F.col(f"wr.{id_col}").alias("id_b"),
            F.col("_selfscore").alias("score"),
        )
    )
    return cross.unionByName(within)


def embedding_near_duplicate_drops(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_rows: int | None = None,
    dims: int | None = None,
    multi_probe: bool = True,
    unique: bool = True,
) -> DataFrame:
    """The vectors to DROP under keep-first embedding near-dedup — one id
    per dropped vector, equal by construction to
    ``embedding_near_duplicates(...).select(id_b).distinct()`` but with
    O(n) output: the within-cluster O(k²) pair set is never materialized
    (parity with the token path's ``near_duplicate_drops`` — the
    SemDeDup-style curation primitive for embedding columns).

    A vector is dropped iff some vector scoring ≥ threshold against it
    has a smaller id. The drop set decomposes exactly into (a) every
    non-representative member of a cluster whose self-score clears the
    threshold (its rep is a smaller value-identical vector; the
    self-score gate matters only for degenerate zero-norm vectors, whose
    null cosine never clears any threshold — matching the pair path) and
    (b) every member of a cluster whose rep appears as the LARGER side
    of a verified representative pair (that pair's smaller rep is
    smaller than every member of the larger-rep cluster; members dropped
    via a cross-cluster smaller NON-rep member are caught by (a), since
    their own rep is smaller still). Both are id-per-row joins over the
    membership map — pair volume never appears.
    """
    if dims is None:
        dims = bucket_dims(n_rows if n_rows is not None else _default_nrows(df))
    reps, members, _dup_keys = _emb_collapse(df, id_col, vec_col)
    rep_pairs = _emb_rep_pairs(
        reps, id_col, vec_col, dims, threshold, multi_probe
    )
    dropped_keys = rep_pairs.select(F.col("_kb").alias("_vkey")).distinct()
    selfscore_ok = reps.where(
        F.round(
            F.try_divide(
                _dot(F.col(vec_col), F.col(vec_col)),
                _norm(F.col(vec_col)) * _norm(F.col(vec_col)),
            ),
            6,
        )
        >= threshold
    ).select("_vkey", F.col(id_col).alias("_rep"))
    # ONE pass over the membership map (r16, guide §2.4 — same rewrite
    # as the token path's near_duplicate_drops): both branches decide on
    # cluster-level facts, so fold the dropped flag onto the reps-scaled
    # selfscore frame and let a single members join decide drop iff
    # (id != rep) OR cluster-dropped. Lossless inner/left joins: every
    # dropped key's reps cleared the score threshold (a null-score
    # zero-norm rep can never appear in a verified pair), so
    # dropped_keys ⊆ selfscore_ok keys, and members of zero-norm
    # clusters — never droppable — fall out of the inner join exactly as
    # they fell out of both old branches.
    # merge hints: selfscore_ok/dropped_keys are aggregate/pair-derived
    # and data-scaled — never estimate-broadcast (round-13 audit)
    flagged = selfscore_ok.hint("merge").join(
        dropped_keys.withColumn("_dropped", F.lit(True)), "_vkey", "left"
    )
    out = (
        members.hint("merge").join(flagged, "_vkey")
        .where((F.col(id_col) != F.col("_rep")) | F.col("_dropped").isNotNull())
        .select(id_col)
    )
    # ``unique=False`` skips the distinct for left_anti consumers (the
    # id SET is identical; anti-joins ignore right-side multiplicity —
    # and post-rewrite each member id emits at most once anyway)
    return out.distinct() if unique else out


# ------------------------------------ incremental embedding dedup
# Embedding-side parity with the token path's persist_corpus_lsh /
# near_duplicates_against (ops/dedup.py): the corpus' near-dup probe
# state persists ONCE — collapsed representative vectors bucketed by
# their sign-LSH bucket, plus the (rep id → member id) map — and each
# incoming shard probes the bucketed tables with NO corpus-side
# Exchange. The continuous-ingestion shape at 100 TB: corpus state is
# written once per compaction, probing cost tracks the shard.


def _emb_vkey(vec_col: str) -> Column:
    """The exact-collapse key used by embedding_near_duplicates — two
    independently-seeded xxhash64 passes over the raw array."""
    return F.struct(
        F.xxhash64(F.col(vec_col)).alias("h1"),
        F.xxhash64(F.lit(1), F.col(vec_col)).alias("h2"),
    )


def persist_corpus_embeddings(
    spark,
    corpus: DataFrame,
    name: str,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int | None = None,
    n_rows: int | None = None,
    n_buckets: int = 64,
):
    """Materialize the corpus' embedding near-dup probe state as three
    catalog tables; returns (vecs_table, members_table, ids_table, dims) — the
    id-bucketed ``<name>_ids`` replay-guard sidecar is the third
    table.

    - ``<name>_vecs`` (bucket, rid, vec, norm): ONE row per distinct
      vector (exact-collapse — a boilerplate cluster of identical
      embeddings contributes one probe row), bucketed by the sign-LSH
      ``bucket`` so probe joins read co-located buckets with no
      corpus-side Exchange;
    - ``<name>_members`` (rid, id): the collapse membership map keyed by
      the representative's id (a plain long), bucketed by ``rid`` for
      the match-expansion join.

    ``dims`` (occupancy-sized from the corpus row count by default) must
    be passed to ``embedding_near_duplicates_against`` unchanged — the
    shard's probe buckets are only comparable under the same bit count.
    """
    from .util import persist_bucketed

    if dims is None:
        dims = bucket_dims(n_rows if n_rows is not None else _default_nrows(corpus))
    keyed = corpus.select(F.col(id_col), F.col(vec_col), _emb_vkey(vec_col).alias("_vkey"))
    reps = keyed.groupBy("_vkey").agg(
        F.min(id_col).alias("rid"), F.first(vec_col).alias(vec_col)
    )
    vecs = reps.select(
        sign_bucket(F.col(vec_col), dims).alias("bucket"),
        F.col("rid"),
        F.col(vec_col).alias("vec"),
        _norm(F.col(vec_col)).alias("norm"),
    )
    members = keyed.join(
        reps.select("_vkey", "rid"), "_vkey"
    ).select(F.col("rid"), F.col(id_col).alias("id"))
    vecs_t = persist_bucketed(spark, vecs, f"{name}_vecs", f"{path}_vecs",
                              n_buckets, "bucket")
    members_t = persist_bucketed(spark, members, f"{name}_members",
                                 f"{path}_members", n_buckets, "rid")
    # id-bucketed replay-guard sidecar (see dedup.persist_corpus_lsh):
    # the stream anti-joins it on its own bucket key per micro-batch,
    # so the corpus side pays no Exchange
    ids_t = persist_bucketed(
        spark, corpus.select(F.col(id_col).alias("id")),
        f"{name}_ids", f"{path}_ids", n_buckets, "id",
    )
    return vecs_t, members_t, ids_t, dims


def embedding_near_duplicates_against(
    new_df: DataFrame,
    corpus_vecs: DataFrame,
    corpus_members: DataFrame,
    dims: int,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(new_id, corpus_id, score) for every NEW vector whose cosine
    against some persisted-corpus vector reaches ``threshold``.

    The shard collapses to distinct vectors, each probing its own sign
    bucket plus every one-bit flip (full Hamming-1 multi-probe — the
    roles are fixed here, so unlike the self-join path both sides of a
    bit difference cannot meet halfway and the shard probes ALL flips).
    A corpus vector lives in exactly one bucket, so each (new, corpus)
    candidate arises at most once — no dedup join. Scoring is the exact
    cosine, so precision is exact; recall is guaranteed for sign
    signatures within Hamming 1 and probabilistic beyond, the identical
    contract to ``embedding_near_duplicates(multi_probe=True)``.

    The corpus side contributes NO Exchange (bucketed storage satisfies
    the join's clustering); the only data-scaled shuffle is the shard's
    own probe explode. Matches expand through both membership maps, so
    duplicate clusters on either side cost one probe row, not one per
    copy."""
    nkeyed = new_df.select(
        F.col(id_col), F.col(vec_col), _emb_vkey(vec_col).alias("_vkey")
    )
    nreps = nkeyed.groupBy("_vkey").agg(
        F.min(id_col).alias("_nid"), F.first(vec_col).alias(vec_col)
    )
    nmembers = nkeyed.select("_vkey", F.col(id_col).alias("new_id"))
    probes = nreps.select(
        F.col("_vkey"),
        F.col(vec_col),
        _norm(F.col(vec_col)).alias("_qn"),
        F.explode(
            _probe_buckets(sign_bucket(F.col(vec_col), dims), dims)
        ).alias("bucket"),
    )
    cand = (
        probes.join(corpus_vecs, "bucket")
        .select(
            F.col("_vkey"),
            F.col("rid"),
            F.round(
                F.try_divide(
                    _dot(F.col(vec_col), F.col("vec")),
                    F.col("_qn") * F.col("norm"),
                ),
                6,
            ).alias("score"),
        )
        .where(F.col("score") >= threshold)
    )
    return (
        cand.join(nmembers, "_vkey")
        .join(corpus_members, "rid")
        .select("new_id", F.col("id").alias("corpus_id"), "score")
    )


# ------------------------------------------------------------------ PQ
# Product quantization (ADC scoring): the memory-side scale path for
# vector search. Sign-LSH / IVF prune WHICH vectors a query compares
# against; PQ compresses WHAT is stored per vector — a d-dim float32
# embedding (d*4 bytes) becomes m small codes (m bytes at n_codes<=256),
# e.g. 64-dim/256 B -> 8 B at the defaults below. At 100 TB of raw
# embeddings the PQ-coded corpus is ~1.5 TB, small enough to keep the
# entire scoring set in executor memory, and scoring drops from O(d)
# multiplies per candidate to O(m) table lookups. IVF-PQ (``ivf_pq_topk``)
# composes both, which is the standard billion-scale ANN architecture
# (Jégou et al., "Product Quantization for Nearest Neighbor Search",
# IEEE TPAMI 2011; the FAISS IndexIVFPQ layout).
#
# Everything is built-in Column expressions: codebooks are driver-side
# literal constants shipped with the plan (like IVF centroids), encoding
# is a shuffle-free map stage, and ADC scoring is zip_with/element_at
# lookups — no UDFs, whole-stage codegen throughout.

PQ_SUBSPACES = 8
PQ_CODES = 16


def _pq_sub(vec: Column, sub: int, subdim: int) -> Column:
    return F.slice(vec, sub * subdim + 1, subdim)


def _pq_subdim(codebooks: list[list[list[float]]]) -> int:
    return len(codebooks[0][0])


def pq_seed_codebooks(
    corpus: DataFrame,
    m: int = PQ_SUBSPACES,
    n_codes: int = PQ_CODES,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Deterministic codebooks: subspace slices of the ``n_codes``
    lowest-id corpus vectors (the same seeding convention as
    ``ivf_topk``'s default centroids, so tests and oracles are
    reproducible without a training job). ``codebooks[sub][code]`` is the
    code's sub-vector. Training (``pq_train_codebooks``) only changes
    these constants, never the plan shape."""
    if corpus is None:
        raise ValueError(
            "pq_seed_codebooks needs a corpus — pass codebooks explicitly "
            "when calling pq_topk/ivf_pq_topk without one"
        )
    rows = (
        corpus.where(F.col(id_col) < n_codes)
        .select(id_col, vec_col)
        .orderBy(id_col)
        .collect()
    )
    if len(rows) != n_codes:
        # the id < n_codes slice assumes dense integer ids 0..n_codes-1;
        # a sparse/short corpus would silently produce a short codebook
        raise ValueError(
            f"pq_seed_codebooks expected {n_codes} seed rows with "
            f"{id_col} in [0, {n_codes}), got {len(rows)} — pass trained "
            "codebooks (pq_train_codebooks) for corpora without dense ids"
        )
    dim = len(rows[0][1])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    subdim = dim // m
    return [
        [[float(x) for x in r[1][sub * subdim : (sub + 1) * subdim]] for r in rows]
        for sub in range(m)
    ]


def pq_train_codebooks(
    corpus: DataFrame,
    m: int = PQ_SUBSPACES,
    n_codes: int = PQ_CODES,
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 10,
) -> list[list[list[float]]]:
    """K-means-trained codebooks, one independent quantizer per subspace
    (the production path). Each fit is a distributed MLlib job over the
    corpus' sub-vectors; deterministic for a fixed seed."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    dim = len(corpus.select(vec_col).first()[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    subdim = dim // m
    books = []
    for sub in range(m):
        feat = corpus.select(
            array_to_vector(
                _pq_sub(F.col(vec_col), sub, subdim).cast("array<double>")
            ).alias("features")
        )
        model = KMeans(k=n_codes, seed=seed + sub, maxIter=max_iter).fit(feat)
        books.append([[float(x) for x in c] for c in model.clusterCenters()])
    return books


def _book_lit(book: list[list[float]]) -> Column:
    return F.array(*[F.array(*[F.lit(float(x)) for x in cv]) for cv in book])


def pq_encode_expr(vec: Column, codebooks: list[list[list[float]]]) -> Column:
    """``array<int>`` of per-subspace nearest-code ids (L2; ties → smaller
    code). Pure per-row expression — encoding 100 TB is a map stage.

    argmin ||x_sub - c||² == argmax (x_sub·c - ||c||²/2). The per-code
    dot runs INSIDE one higher-order-function lambda over the literal
    codebook array — one dot expression per subspace in the plan instead
    of ``n_codes`` unrolled copies. Round 6 unrolled all 8×16 dot trees
    into the plan and paid a 7–10 s fixed analysis/codegen wall per query
    submission (SCALE.md round-6 note); this form compiles in well under
    a second with bit-identical results (same fold order per code).
    Ties: ``array_position`` returns the FIRST index of the max score —
    the smallest code, matching the struct-max idiom it replaces.
    """
    subdim = _pq_subdim(codebooks)
    codes = []
    for sub, book in enumerate(codebooks):
        subv = _pq_sub(vec, sub, subdim)
        half = F.array(
            *[F.lit(sum(float(x) * float(x) for x in cv) / 2.0) for cv in book]
        )
        scores = F.zip_with(
            _book_lit(book), half, lambda carr, h: _dot(subv, carr) - h
        )
        codes.append(
            (F.array_position(scores, F.array_max(scores)) - F.lit(1)).cast("int")
        )
    return F.array(*codes)


def _pq_recon_sqnorms(codebooks: list[list[list[float]]]) -> list[list[float]]:
    # ||x̂||² decomposes over subspaces: x̂ is the concatenation of the
    # chosen sub-centroids, so its squared norm is the sum of theirs
    out = []
    for book in codebooks:
        row = []
        for cv in book:
            s = 0.0
            for x in cv:
                s += float(x) * float(x)
            row.append(s)
        out.append(row)
    return out


def _with_recon_norm(df: DataFrame, codebooks: list[list[list[float]]],
                     codes_col: str = "codes") -> DataFrame:
    """Attach ``recon_norm`` (the PQ reconstruction's norm) from the
    codes column alone — a per-subspace squared-norm table lookup."""
    sq = _pq_recon_sqnorms(codebooks)
    sq_lit = F.array(*[F.array(*[F.lit(v) for v in row]) for row in sq])
    return df.withColumn(
        "recon_norm",
        F.sqrt(
            F.aggregate(
                F.zip_with(
                    F.col(codes_col),
                    sq_lit,
                    lambda c, row: F.element_at(row, c + F.lit(1)),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        ),
    )


def _persist_bucketed(spark, df: DataFrame, name: str, path: str,
                      n_buckets: int, key: str = "centroid_id") -> DataFrame:
    from .util import persist_bucketed

    return persist_bucketed(spark, df, name, path, n_buckets, key)


def pq_encode(
    corpus: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(neighbor_id, codes, recon_norm): the PQ-coded corpus. This is the
    table you PERSIST at scale — m ints + one double per vector instead
    of the raw embedding; ``recon_norm`` (the reconstruction's norm, a
    codebook lookup) is precomputed so cosine ADC never touches vectors.
    """
    return _with_recon_norm(
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            pq_encode_expr(F.col(vec_col), codebooks).alias("codes"),
        ),
        codebooks,
    )


def _pq_luts(qvec: Column, codebooks: list[list[list[float]]]) -> Column:
    """Per-query ADC lookup tables: ``luts[sub][code] = q_sub · c`` —
    computed ONCE per query row (m × n_codes small dots), after which
    every candidate scores with m element_at lookups. The per-code dot
    runs inside one ``transform`` lambda over the literal codebook (same
    compile-cost argument as ``pq_encode_expr``)."""
    subdim = _pq_subdim(codebooks)
    return F.array(
        *[
            # NB: one-arg lambda (two args would mean (element, index));
            # capturing the loop vars is safe — pyspark invokes the
            # lambda synchronously while building the expression
            F.transform(
                _book_lit(book),
                lambda carr: _dot(_pq_sub(qvec, sub, subdim), carr),
            )
            for sub, book in enumerate(codebooks)
        ]
    )


def _pq_adc_score(codes: Column, luts: Column, qnorm: Column, recon_norm: Column) -> Column:
    num = F.aggregate(
        F.zip_with(codes, luts, lambda c, lut: F.element_at(lut, c + F.lit(1))),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return num / (qnorm * recon_norm)


def pq_topk(
    corpus: DataFrame | None,
    queries: DataFrame,
    k: int = 10,
    codebooks: list[list[list[float]]] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    encoded: DataFrame | None = None,
) -> DataFrame:
    """Approximate top-k by asymmetric-distance cosine: the query keeps
    its exact vector, each corpus vector is replaced by its PQ
    reconstruction. Full scan like ``cosine_topk`` but over the coded
    corpus — O(m) lookups per candidate instead of O(d) multiplies, and
    the scanned table is ~d*4/m times smaller. Pass ``encoded`` (from
    ``pq_encode``, persisted) to skip encoding; use ``ivf_pq_topk`` to
    also prune candidates."""
    from pyspark.sql.window import Window

    if corpus is None and (codebooks is None or encoded is None):
        raise ValueError(
            "pq_topk: corpus=None requires both codebooks and encoded"
        )
    if codebooks is None:
        codebooks = pq_seed_codebooks(corpus, id_col=id_col, vec_col=vec_col)
    if encoded is None:
        encoded = pq_encode(corpus, codebooks, id_col, vec_col)
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            _pq_luts(F.col(vec_col), codebooks).alias("luts"),
            _norm(F.col(vec_col)).alias("qnorm"),
        )
    )
    scored = (
        q.crossJoin(encoded)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _pq_adc_score(
                    F.col("codes"), F.col("luts"), F.col("qnorm"), F.col("recon_norm")
                ),
                6,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def ivf_pq_assigned_corpus(
    corpus: DataFrame,
    cents: list[tuple[int, list[float]]],
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(neighbor_id, centroid_id, codes, recon_norm): the IVF-PQ corpus
    layout — inverted-listed AND PQ-coded in one shuffle-free map stage.
    The raw embedding is gone: m ints + one double per vector."""
    pre = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        _norm(F.col(vec_col)).alias("_vn"),
    )
    return _with_recon_norm(
        pre.select(
            "neighbor_id",
            ivf_assign_expr(F.col("cvec"), cents, norm=F.col("_vn")).alias("centroid_id"),
            pq_encode_expr(F.col("cvec"), codebooks).alias("codes"),
        ),
        codebooks,
    )


def persist_ivf_pq_corpus(
    spark,
    corpus: DataFrame,
    name: str,
    path: str,
    centroids: list[tuple[int, list[float]]],
    codebooks: list[list[list[float]]],
    n_buckets: int = IVF_CENTROIDS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Materialize the IVF-PQ corpus bucketed by centroid_id: one write-
    time shuffle, after which probe joins read co-located buckets with no
    corpus-side Exchange AND the stored table is ~d*4/m smaller than the
    raw embeddings — the full billion-scale serving layout."""
    assigned = ivf_pq_assigned_corpus(corpus, centroids, codebooks, id_col, vec_col)
    return _persist_bucketed(spark, assigned, name, path, n_buckets)


def ivf_pq_topk(
    corpus: DataFrame | None,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = IVF_CENTROIDS,
    n_probe: int = IVF_PROBE,
    codebooks: list[list[list[float]]] | None = None,
    centroids: list[tuple[int, list[float]]] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assigned: DataFrame | None = None,
    broadcast_queries: bool = True,
) -> DataFrame:
    """IVF-PQ: IVF pruning (each query probes its ``n_probe`` nearest
    inverted lists) + PQ ADC scoring (candidates scored from codes, not
    vectors). Pass ``assigned`` (from ``persist_ivf_pq_corpus``) to probe
    the pre-coded bucketed table — both the pruning join and the scoring
    then touch no raw embedding, and with ``broadcast_queries=False`` the
    corpus side still joins with no Exchange (plan-asserted in
    tests/test_bucketing.py)."""
    from pyspark.sql.window import Window

    if corpus is None and (
        codebooks is None or centroids is None or assigned is None
    ):
        raise ValueError(
            "ivf_pq_topk: corpus=None requires codebooks, centroids and "
            "assigned (from persist_ivf_pq_corpus)"
        )
    if codebooks is None:
        codebooks = pq_seed_codebooks(corpus, id_col=id_col, vec_col=vec_col)
    cents = centroids if centroids is not None else [
        (int(r[0]), list(r[1]))
        for r in (
            corpus.where(F.col(id_col) < n_centroids)
            .select(id_col, vec_col)
            .orderBy(id_col)
            .collect()
        )
    ]
    if assigned is None:
        assigned = ivf_pq_assigned_corpus(corpus, cents, codebooks, id_col, vec_col)

    qpre = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        _norm(F.col(vec_col)).alias("_qn"),
    )
    qw = Window.partitionBy("query_id").orderBy(
        F.col("pscore").desc(), F.col("centroid_id")
    )
    # per-centroid probe scores inside one zip_with lambda (PQ
    # compile-wall fix — see pq_encode_expr) instead of unrolled dots
    _cs = sorted(cents)
    _cvecs = F.array(*[F.array(*[F.lit(float(x)) for x in cv]) for _, cv in _cs])
    _cmeta = F.array(
        *[
            F.struct(
                F.lit(int(cid)).alias("centroid_id"),
                F.lit(_centroid_norm(cv)).alias("cn"),
            )
            for cid, cv in _cs
        ]
    )
    qp = (
        qpre.select(
            "query_id",
            _pq_luts(F.col("qvec"), codebooks).alias("luts"),
            F.col("_qn").alias("qnorm"),
            F.explode(
                F.zip_with(
                    _cmeta,
                    _cvecs,
                    lambda meta, cv: F.struct(
                        meta["centroid_id"].alias("centroid_id"),
                        (
                            _dot(F.col("qvec"), cv) / (F.col("_qn") * meta["cn"])
                        ).alias("pscore"),
                    ),
                )
            ).alias("pc"),
        )
        .select("query_id", "luts", "qnorm",
                F.col("pc.centroid_id").alias("centroid_id"),
                F.col("pc.pscore").alias("pscore"))
        .withColumn("prank", F.row_number().over(qw))
        .where(F.col("prank") <= n_probe)
        .select("query_id", "luts", "qnorm", "centroid_id")
    )

    scored = (
        assigned.join(F.broadcast(qp) if broadcast_queries else qp, "centroid_id")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _pq_adc_score(
                    F.col("codes"), F.col("luts"), F.col("qnorm"), F.col("recon_norm")
                ),
                6,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


# -------------------------------------------------------- semantic dedup
# SemDeDup (Abbas et al. 2023, arXiv:2303.09540): k-means the embedding
# space, then prune ε-balls WITHIN each cluster, keeping the example
# LEAST similar to its centroid (diversity-preserving — the kept copy is
# the cluster's most "atypical" member). This complements
# embedding_near_duplicate_drops: the sign-LSH path targets near-exact
# copies (multi-probe reaches Hamming≤1 signatures, right for ε≈0.95+),
# while cluster-scoped search stays effective at SEMANTIC thresholds
# (ε≈0.7–0.9) where near-dup pairs routinely differ in several sign
# bits. Recall is bounded by the paper's own design: pairs straddling a
# k-means boundary are not compared.


def ivf_assign_with_score_expr(
    vec: Column, cents: list[tuple[int, list[float]]], norm: Column | None = None
) -> Column:
    """struct(centroid_id int, csim double) — ``ivf_assign_expr`` plus
    the winning cosine itself (needed by SemDeDup's keep-order). Same
    literal-centroid zip_with shape: a pure map expression, no shuffle.
    Zero-norm vectors yield null csim (and null centroid_id) — they can
    never enter an ε-ball, matching the try_divide convention of the
    near-dup family."""
    norm = norm if norm is not None else _norm(vec)
    cs = sorted(cents)
    cvecs = F.array(*[F.array(*[F.lit(float(x)) for x in cv]) for _, cv in cs])
    cnorms = F.array(*[F.lit(_centroid_norm(cv)) for _, cv in cs])
    cids = F.array(*[F.lit(int(cid)) for cid, _ in cs])
    # try_divide (not /): a zero-norm vector must yield null, not an
    # ANSI DIVIDE_BY_ZERO — unlike ivf_assign_expr, whose corpus paths
    # pre-filter zero vectors before assignment
    scores = F.zip_with(
        cvecs, cnorms, lambda cv, cn: F.try_divide(_dot(vec, cv), norm * cn)
    )
    best = F.array_max(scores)
    # guard the id on the score: for a zero-norm vector every score is
    # null and array_position's null handling is not something to lean
    # on — the contract is (null, null)
    cid = F.when(
        best.isNotNull(),
        F.element_at(cids, F.array_position(scores, best).cast("int")),
    ).cast("int")
    return F.struct(cid.alias("centroid_id"), best.alias("csim"))


def assign_centroids_np(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Nearest-centroid assignment as an Arrow-batched numpy matmul —
    the large-k shape. Returns EVERY input column (a ``_vkey`` struct,
    if present, is flattened through the UDF as two long columns and
    rebuilt) plus ``_cid int, _csim double``, matching
    ``ivf_assign_with_score_expr``:
    ties break to the smallest centroid id (argmax-first over cid-sorted
    rows), zero-norm vectors and all-null score rows yield (null, null),
    zero-norm CENTROIDS are skipped (score -inf), and float32 inputs
    widen exactly to float64 before the fold.

    Why not the literal expression: at k=160/d=64 the zip_with-over-
    literal-codebook plan evaluates ~25 s for 20k rows (interpreted HOF
    per element); the same work is one BLAS matmul per Arrow batch —
    and at the SemDeDup paper's k=50k a literal plan is infeasible
    outright. The codebook ships via ``SparkContext.broadcast`` (one
    copy per executor, not per task); the stage stays map-side — no
    shuffle, exactly like the expression it replaces. The only
    difference from the expression path is summation ORDER (pairwise/
    SIMD vs left fold), so csim can differ in final ulps; keep-order
    comparisons between near-tied csims may flip accordingly.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import StructType

    if not centroids:
        raise ValueError("centroids must be non-empty")
    cs = sorted(centroids)
    cmat = np.array([cv for _, cv in cs], dtype=np.float64)
    cnorms = np.sqrt((cmat * cmat).sum(axis=1))
    cid_arr = np.array([int(cid) for cid, _ in cs], dtype=np.int64)
    bc = df.sparkSession.sparkContext.broadcast((cmat, cnorms, cid_arr))

    has_vkey = "_vkey" in df.columns
    if has_vkey:
        inp = df.selectExpr(
            "_vkey.h1 AS _h1",
            "_vkey.h2 AS _h2",
            *[c for c in df.columns if c != "_vkey"],
        )
    else:
        inp = df
    out_schema = StructType(
        list(inp.schema.fields)
    ).add("_cid", "integer").add("_csim", "double")

    def _assign(batches):
        cm, cn, cids = bc.value
        live = cn > 0.0
        for pdf in batches:
            m = len(pdf)
            if m == 0:
                continue
            d = cm.shape[1]
            # null vectors behave like zero-norm ones: (null, null) —
            # the expression path's null-propagation contract
            V = np.stack(
                [
                    np.zeros(d) if v is None or len(v) == 0
                    else np.asarray(v, dtype=np.float64)
                    for v in pdf[vec_col]
                ]
            )
            vn = np.sqrt((V * V).sum(axis=1))
            ok = vn > 0.0
            if live.any() and ok.any():
                # full-width score matrix, dead-centroid columns stay
                # -inf (the expression path's null-skip) — argmax over
                # cid-sorted columns makes ties break to the smallest cid
                S = np.full((m, len(cids)), -np.inf)
                S[np.ix_(ok, live)] = (V[ok] @ cm[live].T) / (
                    vn[ok, None] * cn[live][None, :]
                )
                j = S.argmax(axis=1)
                best = S[np.arange(m), j]
                won = ok & (best != -np.inf)
                cid_out = [
                    int(cids[jj]) if w else None for jj, w in zip(j, won)
                ]
                csim_out = [
                    float(b) if w else None for b, w in zip(best, won)
                ]
            else:
                cid_out = [None] * m
                csim_out = [None] * m
            out = pdf.copy()
            out["_cid"] = pd.array(cid_out, dtype="Int32")
            out["_csim"] = pd.array(csim_out, dtype="Float64")
            yield out

    res = inp.mapInPandas(_assign, schema=out_schema)
    if not has_vkey:
        return res
    return res.select(
        F.struct(
            F.col("_h1").alias("h1"), F.col("_h2").alias("h2")
        ).alias("_vkey"),
        *[c for c in df.columns if c != "_vkey"],
        "_cid",
        "_csim",
    )


def semantic_dedup_drops(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assign: str = "expr",
) -> DataFrame:
    """The vectors to DROP under SemDeDup pruning — one ``id_col`` row
    per dropped vector, O(n) output.

    Rule (pair form of the paper's greedy order): fix the keep-order
    (csim ASC, id ASC) — least-centroid-similar first, ids breaking
    ties. A vector x is dropped iff some vector y in the SAME k-means
    cluster has cosine(x, y) ≥ threshold and y precedes x in keep-order.
    Like ``near_duplicate_drops``, this is the pairwise (non-greedy)
    form: a dropped y still shadows x, which prunes slightly more than
    the sequential-greedy variant on chains; the transitive closure of
    an ε-chain can be had by clustering the pair graph instead.

    100 TB shape: ``len(centroids)`` MUST scale with the corpus — the
    within-cluster scan is O((n/k)²) per cluster, so hold target
    occupancy (n/k) constant as n grows (the SemDeDup paper runs k=50k
    on LAION); with that, total pair volume stays linear. Centroid
    assignment is a shuffle-free map stage either way: ``assign="expr"``
    (default) embeds the codebook as a literal expression
    (``ivf_assign_with_score_expr`` — bit-exact vs the DuckDB/python
    twins, right for small k), ``assign="numpy"`` runs one BLAS matmul
    per Arrow batch with the codebook broadcast once per executor
    (``assign_centroids_np`` — the large-k shape; a literal plan is
    ~10× slower at k=160 and infeasible at k=50k). Value-identical
    vectors are
    exact-collapsed first (one representative per distinct vector enters
    the cluster self-join — a 10⁶-copy document costs one row, not
    O(k²) pairs in one task); the within-cluster self-join is grid-
    salted (``_salted_self_sides``), so the inherent O((n/k)²) per-
    cluster pair scan is spread across bounded tasks. Drops are
    recovered from representative pairs by id-per-row joins over the
    membership map — pair volume toward exact copies never materializes.
    """
    from .dedup import _salted_self_sides

    reps, members, dup_keys = _emb_collapse(df, id_col, vec_col)
    if assign == "numpy":
        assigned = assign_centroids_np(
            reps.select(id_col, "_vkey", vec_col), centroids, id_col, vec_col
        )
    elif assign == "expr":
        assigned = reps.select(
            id_col,
            "_vkey",
            vec_col,
            ivf_assign_with_score_expr(F.col(vec_col), centroids).alias("_a"),
        ).select(
            id_col, "_vkey", vec_col,
            F.col("_a.centroid_id").alias("_cid"),
            F.col("_a.csim").alias("_csim"),
        )
    else:
        raise ValueError(f"assign must be 'expr' or 'numpy', got {assign!r}")
    assigned = assigned.where(F.col("_cid").isNotNull())
    sl, sr = _salted_self_sides(assigned, ["_cid"], id_col)
    # keep-order residual: the surviving orientation has the PRECEDING
    # vector on the left, so the right side is always the loser
    order_resid = (F.col("sl._csim") < F.col("sr._csim")) | (
        (F.col("sl._csim") == F.col("sr._csim"))
        & (F.col(f"sl.{id_col}") < F.col(f"sr.{id_col}"))
    )
    cos = F.expr(_dot_sql(f"sl.{vec_col}", f"sr.{vec_col}")) / (
        F.expr(_norm_sql(f"sl.{vec_col}")) * F.expr(_norm_sql(f"sr.{vec_col}"))
    )
    # merge hint: both self-join sides are the corpus-sized assigned
    # frame whose estimate is derived through the Arrow assignment —
    # an estimate-driven broadcast re-computes the assignment AND dies
    # at scale (round-13 suite-wide broadcast audit)
    loser_keys = (
        sl.alias("sl").hint("merge")
        .join(
            sr.alias("sr"),
            (F.col("sl._cid") == F.col("sr._cid"))
            & (F.col("sl._gi") == F.col("sr._gi"))
            & (F.col("sl._gj") == F.col("sr._gj"))
            & order_resid
            & (cos >= threshold),
        )
        .select(F.col("sr._vkey").alias("_vkey"))
        .distinct()
    )
    # exact copies of ANY kept vector: cos(v, v) = 1 ≥ ε (nonzero v), and
    # within a value-identical cluster keep-order degenerates to id — so
    # every non-representative member is dropped. Zero vectors (null
    # self-cosine) never clear the gate, matching the pair convention.
    selfscore_ok = reps.where(
        F.try_divide(
            _dot(F.col(vec_col), F.col(vec_col)),
            _norm(F.col(vec_col)) * _norm(F.col(vec_col)),
        )
        >= threshold
    ).select("_vkey", F.col(id_col).alias("_rep"))
    non_reps = (
        members.hint("merge").join(selfscore_ok, "_vkey")
        .where(F.col(id_col) != F.col("_rep"))
        .select(id_col)
    )
    loser_members = (
        members.hint("merge").join(loser_keys, "_vkey").select(id_col)
    )
    return non_reps.unionByName(loser_members).distinct()
