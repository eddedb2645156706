"""Training-data pipeline operator tests: dedup, ANN, text, multimodal."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from logrange_spark.ops import ann, dedup, multimodal, text


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),  # near-dup of 1
        (3, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (4, "completely different content about spark engines and shuffles"),
        (5, "el perro corre por la calle y el gato duerme en la casa"),
        (6, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_exact_duplicates(docs):
    d = dedup.exact_duplicates(docs, "doc_id", F.col("text")).collect()
    assert len(d) == 1
    assert d[0]["keep_id"] == 1 and d[0]["dup_count"] == 2


def test_shingles(docs, spark):
    row = docs.where("doc_id = 1").select(
        dedup.shingles(F.col("text")).alias("s")
    ).collect()[0]
    assert "the quick brown" in row["s"]
    assert len(row["s"]) == 7  # 9 tokens → 7 trigrams (all distinct here)
    empty = docs.where("doc_id = 6").select(dedup.shingles(F.col("text")).alias("s")).collect()[0]
    assert empty["s"] == []


def test_tokens_sql_matches_column_api(docs):
    """text.tokens_sql is the selectExpr twin of text.tokens — the hot
    dedup paths build the former; value equality is the contract."""
    a = docs.select("doc_id", text.tokens(F.col("text")).alias("t"))
    b = docs.selectExpr("doc_id", f"{text.tokens_sql('text')} AS t")
    assert a.schema == b.schema
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_quality_score_sql_matches_column_api(docs, spark):
    """quality_score_sql mirrors quality_score op-for-op (same double
    fold, same int/int stopword-ratio division) — bit-identical values,
    so the registry quality gates can build via the parsed-SQL form."""
    a = docs.select("doc_id", text.quality_score(F.col("text")).alias("q"))
    b = docs.selectExpr("doc_id", f"{text.quality_score_sql('text')} AS q")
    assert a.schema == b.schema
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_sig_keyed_sql_matches_column_api(docs):
    """_sig_keyed's selectExpr-built shingle+minhash projection computes
    the same values as an independent Column-API construction (the form
    it replaced), seed prefixes and zero-shingle handling included."""
    toked = dedup._token_frame(docs, "doc_id", "text")
    got = dedup._sig_keyed(toked, "doc_id")

    def seeded(s):
        prefix = F.lit(f"{s}|")
        return lambda x: F.md5(F.concat(prefix, x))

    ref = toked.select(
        F.col("doc_id"),
        F.md5(F.concat_ws(" ", "_tok")).alias("_tkey"),
        dedup._shingles_of(F.col("_tok")).alias("_sh"),
    ).select(
        "doc_id",
        "_tkey",
        *[
            F.array_min(F.transform(F.col("_sh"), seeded(s))).alias(f"mh{s}")
            for s in range(dedup.MINHASH_SEEDS)
        ],
    )
    assert got.schema == ref.schema
    assert got.exceptAll(ref).count() == 0 and ref.exceptAll(got).count() == 0


def test_corpus_minhash_overlap(docs, spark):
    """Corpus-level overlap estimator: identical corpora → 1.0, corpora
    with disjoint shingles → 0.0, and the partial split matches a python
    twin computing the same md5 corpus-minhash seed agreement exactly."""
    import hashlib

    row = dedup.corpus_minhash_overlap(docs, docs).collect()[0]
    assert (row["seeds"], row["seeds_agree"], row["jaccard_est"]) == (12, 12, 1.0)

    other = spark.createDataFrame(
        [(10, "zonal quux verdigris plinth oblast xylem crwth")],
        "doc_id long, text string",
    )
    row = dedup.corpus_minhash_overlap(docs, other).collect()[0]
    assert row["seeds_agree"] == 0 and row["jaccard_est"] == 0.0

    # python twin on the even/odd split of the fixture corpus
    def corpus_min(rows, seed):
        mins = []
        for txt in rows:
            toks = [t for t in txt.lower().strip().split() if t]
            sh = {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
            if sh:
                mins.append(
                    min(
                        hashlib.md5(f"{seed}|{g}".encode()).hexdigest()
                        for g in sh
                    )
                )
        return min(mins) if mins else None

    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    a = [t for i, t in texts.items() if i % 2 == 0]
    b = [t for i, t in texts.items() if i % 2 == 1]
    expect = sum(
        1
        for s in range(12)
        if corpus_min(a, s) is not None and corpus_min(a, s) == corpus_min(b, s)
    )
    got = dedup.corpus_minhash_overlap(
        docs.where(F.col("doc_id") % 2 == 0),
        docs.where(F.col("doc_id") % 2 == 1),
    ).collect()[0]
    assert got["seeds_agree"] == expect
    assert got["jaccard_est"] == round(expect / 12.0, 6)


def test_lsh_finds_near_and_exact_dups(docs):
    pairs = {(r["id_a"], r["id_b"]) for r in dedup.lsh_candidate_pairs(docs, "doc_id", "text").collect()}
    assert (1, 3) in pairs  # exact dup always collides
    assert (1, 2) in pairs or (2, 3) in pairs  # near-dup should band-collide
    assert (1, 4) not in pairs and (4, 5) not in pairs


def test_near_duplicates_jaccard(docs):
    nd = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.near_duplicates(docs, "doc_id", "text", threshold=0.5).collect()
    }
    assert nd[(1, 3)] == 1.0
    assert 0.5 <= nd[(1, 2)] < 1.0
    assert (1, 4) not in nd


def test_simhash_pairs(docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dedup.simhash_near_pairs(docs, "doc_id", "text", max_hamming=3).collect()
    }
    assert pairs[(1, 3)] == 0  # identical text → identical simhash
    assert all(h <= 3 for h in pairs.values())


def test_simhash_deterministic(docs):
    a = {r["doc_id"]: r["simhash"] for r in dedup.simhash(docs, "doc_id", "text").collect()}
    b = {r["doc_id"]: r["simhash"] for r in dedup.simhash(docs, "doc_id", "text").collect()}
    assert a == b
    assert a[1] == a[3]


def _py_simhash64(txt: str) -> int | None:
    """hashlib twin of dedup._simhash_keyed64: token hash = first 16 hex
    digits of md5 as two 32-bit words, sign-vote per bit, bit 63 placed
    as -2**63 (matching the signed bigint the Spark side produces)."""
    import hashlib

    toks = txt.strip().lower().split()
    if not toks:
        return None
    votes = [0] * 64
    for t in toks:
        h = hashlib.md5(t.encode()).hexdigest()
        k1, k2 = int(h[0:8], 16), int(h[8:16], 16)
        for j in range(32):
            votes[j] += 1 if (k1 >> j) & 1 else -1
            votes[32 + j] += 1 if (k2 >> j) & 1 else -1
    v = sum(1 << j for j in range(63) if votes[j] > 0)
    return v - (1 << 63) if votes[63] > 0 else v


def test_simhash64_matches_python_twin(docs):
    got = {
        r["doc_id"]: r["simhash"]
        for r in dedup.simhash(docs, "doc_id", "text", bits=64).collect()
    }
    want = {
        r["doc_id"]: _py_simhash64(r["text"])
        for r in docs.collect()
        if _py_simhash64(r["text"]) is not None
    }
    assert got == want


def test_simhash64_pairs_brute_force(docs):
    """near_pairs(bits=64) ≡ brute-force hamming over the python-twin
    fingerprints — checks banding (16-bit bands), exact-collapse and
    member expansion against ground truth, not just internal agreement."""
    sh = {
        r["doc_id"]: _py_simhash64(r["text"])
        for r in docs.collect()
        if _py_simhash64(r["text"]) is not None
    }
    ids = sorted(sh)
    want = {
        (a, b): bin((sh[a] ^ sh[b]) & ((1 << 64) - 1)).count("1")
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
        if bin((sh[a] ^ sh[b]) & ((1 << 64) - 1)).count("1") <= 3
    }
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dedup.simhash_near_pairs(
            docs, "doc_id", "text", max_hamming=3, bits=64
        ).collect()
    }
    assert got == want
    assert got[(1, 3)] == 0  # the planted exact dup survives the collapse


@pytest.fixture(scope="module")
def vectors(spark):
    rows = [
        (0, [1.0, -0.5, 0.5, -0.5]),
        (1, [0.99, -0.4, 0.55, -0.45]),  # close to 0, same sign bucket
        (2, [-0.5, 1.0, -0.5, 0.5]),     # different bucket
        (3, [-1.0, 0.5, -0.5, 0.5]),     # opposite of 0
        (4, [0.9, -0.6, 0.4, -0.6]),     # close to 0, same sign bucket
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>").cache()


def test_cosine_topk(vectors):
    res = ann.cosine_topk(vectors, vectors.where("vec_id = 0"), k=2)
    rows = res.orderBy("rank").collect()
    assert [r["neighbor_id"] for r in rows] == [1, 4]
    assert rows[0]["score"] > 0.99


def test_bucketed_topk_restricts_to_bucket(vectors):
    res = ann.bucketed_topk(vectors, vectors.where("vec_id = 0"), k=4).collect()
    ids = {r["neighbor_id"] for r in res}
    assert 3 not in ids  # opposite sign bucket
    assert 1 in ids


def test_embedding_near_duplicates(vectors):
    nd = ann.embedding_near_duplicates(vectors, threshold=0.98)
    pairs = {(r["id_a"], r["id_b"]) for r in nd.collect()}
    assert (0, 1) in pairs
    assert (0, 3) not in pairs


def test_text_stats(docs):
    stats = {r["doc_id"]: r for r in text.text_stats(docs).collect()}
    assert stats[1]["n_tokens"] == 9
    assert stats[1]["lang_guess"] == "en"
    assert stats[5]["lang_guess"] == "es"
    assert stats[6]["n_tokens"] == 0 and stats[6]["lang_guess"] == "und"
    assert 0.0 <= stats[4]["quality"] <= 1.0
    assert stats[1]["fingerprint"] == stats[3]["fingerprint"]
    assert stats[1]["fingerprint"] != stats[2]["fingerprint"]


def test_quality_filter_shape(docs):
    q = docs.select("doc_id", text.quality_score(F.col("text")).alias("q"))
    vals = {r["doc_id"]: r["q"] for r in q.collect()}
    assert vals[6] < vals[1]  # empty doc scores lowest


def test_multimodal_plumbing(docs):
    media = multimodal.attach_binary(docs, "doc_id", "text", kind="image")
    rows = {r["media_id"]: r for r in media.collect()}
    assert rows[1]["meta"]["size_bytes"] == len("the quick brown fox jumps over the lazy dog")
    assert rows[1]["meta"]["sha"] == rows[3]["meta"]["sha"]
    feats = multimodal.extract_features(media)
    frows = {r["media_id"]: r for r in feats.collect()}
    assert len(frows[1]["feature"]) == multimodal.FEATURE_DIM
    assert frows[1]["decode_ok"]
    assert frows[1]["feature"] == frows[3]["feature"]


def _png(w, h):
    import struct

    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + struct.pack(">II", w, h)
        + b"\x08\x02\x00\x00\x00"
        + b"\x00" * 4  # crc, unchecked by the header codec
    )


def _gif(w, h):
    import struct

    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00" * 6


def _jpeg(w, h):
    import struct

    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = (
        b"\xff\xc0"
        + struct.pack(">H", 17)
        + b"\x08"
        + struct.pack(">HH", h, w)
        + b"\x03" + b"\x00" * 9
    )
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def _bmp(w, h):
    import struct

    return b"BM" + b"\x00" * 16 + struct.pack("<ii", w, h) + b"\x00" * 4


def test_parse_image_header_pure():
    p = multimodal.parse_image_header
    assert p(_png(640, 480)) == ("png", 640, 480)
    assert p(_gif(320, 200)) == ("gif", 320, 200)
    assert p(_jpeg(1024, 768)) == ("jpeg", 1024, 768)
    assert p(_bmp(64, 32)) == ("bmp", 64, 32)
    assert p(_bmp(64, -32)) == ("bmp", 64, 32)  # top-down DIB
    assert p(None) is None
    assert p(b"") is None
    assert p(b"not an image at all") is None
    assert p(b"\x89PNG\r\n\x1a\n1234") is None  # truncated
    assert p(b"\xff\xd8\xff\xd9") is None  # JPEG with no SOF
    # 0xFF fill bytes before a marker are spec-valid (B.1.1.2)
    import struct
    filled = (
        b"\xff\xd8" + b"\xff\xff"  # two fill bytes
        + b"\xff\xc0" + struct.pack(">H", 17) + b"\x08"
        + struct.pack(">HH", 480, 640) + b"\x03" + b"\x00" * 9
    )
    assert p(filled) == ("jpeg", 640, 480)


def _wav(rate=16000, channels=1, bits=16, n_samples=32000):
    import struct

    block = channels * bits // 8
    data = b"\x00" * (n_samples * block)
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * block, block, bits)
    body = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def _box(btype: bytes, payload: bytes) -> bytes:
    import struct

    return struct.pack(">I", 8 + len(payload)) + btype + payload


def _mp4(width=1920, height=1080, timescale=1000, duration=90_000, tkhd_v=0):
    import struct

    mvhd = b"\x00\x00\x00\x00" + b"\x00" * 8 + struct.pack(">II", timescale, duration) + b"\x00" * 80
    pre = 76 if tkhd_v == 0 else 88
    tkhd = bytes([tkhd_v]) + b"\x00" * (pre - 1) + struct.pack(
        ">II", width << 16, height << 16
    )
    moov = _box(b"mvhd", mvhd) + _box(b"trak", _box(b"tkhd", tkhd))
    return _box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2") + _box(b"moov", moov)


def test_parse_audio_header_wav():
    p = multimodal.parse_audio_header
    assert p(_wav(16000, 1, 16, 32000)) == ("wav", 16000, 1, 16, 2.0)
    assert p(_wav(44100, 2, 16, 44100)) == ("wav", 44100, 2, 16, 1.0)
    assert p(None) is None
    assert p(b"") is None
    assert p(b"RIFF\x00\x00\x00\x00AVI ") is None  # RIFF but not WAVE
    assert p(_png(2, 2)) is None


def test_parse_video_header_mp4():
    p = multimodal.parse_video_header
    assert p(_mp4(1920, 1080, 1000, 90_000)) == ("mp4", 1920, 1080, 90.0)
    # version-1 tkhd (64-bit times) shifts the dims by 12 bytes
    assert p(_mp4(640, 360, 600, 1200, tkhd_v=1)) == ("mp4", 640, 360, 2.0)
    assert p(None) is None
    assert p(b"") is None
    assert p(b"\x00\x00\x00\x08free") is None  # no ftyp
    assert p(_wav()) is None


def test_multimodal_real_codec_audio_video_kinds(spark):
    """extract_features(real_codec=True) dispatches on kind: WAV rows get
    [fmt, rate, channels, bits, duration, ...], MP4 rows get
    [fmt, w, h, aspect, duration, ...]; junk payloads decode_ok=False."""
    audio = spark.createDataFrame(
        [(1, _wav(16000, 2, 16, 16000)), (2, b"junk")],
        "doc_id long, payload binary",
    )
    am = multimodal.attach_binary(audio, "doc_id", "payload", kind="audio")
    arows = {r["media_id"]: r for r in
             multimodal.extract_features(am, real_codec=True).collect()}
    assert arows[1]["decode_ok"]
    assert arows[1]["feature"][:5] == [5.0, 16000.0, 2.0, 16.0, 1.0]
    assert not arows[2]["decode_ok"] and arows[2]["feature"] is None

    video = spark.createDataFrame(
        [(1, _mp4(1280, 720, 1000, 30_000)), (2, _wav())],
        "doc_id long, payload binary",
    )
    vm = multimodal.attach_binary(video, "doc_id", "payload", kind="video")
    vrows = {r["media_id"]: r for r in
             multimodal.extract_features(vm, real_codec=True).collect()}
    assert vrows[1]["decode_ok"]
    fmt, w, h, aspect, dur = vrows[1]["feature"][:5]
    assert (fmt, w, h, dur) == (6.0, 1280.0, 720.0, 30.0)
    assert abs(aspect - 1280 / 720) < 1e-6
    # a WAV payload under kind=video does not parse as MP4
    assert not vrows[2]["decode_ok"]


def test_multimodal_real_codec_reads_header_dims(spark):
    """real_codec=True runs the struct-unpack header codec: actual
    dimensions for image payloads, decode_ok=False for non-images
    (round-4 task: replace the NotImplementedError stub)."""
    rows = [
        (1, _png(640, 480)),
        (2, _gif(320, 200)),
        (3, _jpeg(1024, 768)),
        (4, b"plain text, not an image"),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    media = multimodal.attach_binary(df, "doc_id", "payload", kind="image")
    out = {r["media_id"]: r for r in
           multimodal.extract_features(media, real_codec=True).collect()}
    # feature = [fmt_id, width, height, aspect, log2(size), 0, 0, 0]
    assert out[1]["decode_ok"] and out[1]["feature"][1:3] == [640.0, 480.0]
    assert out[2]["decode_ok"] and out[2]["feature"][1:3] == [320.0, 200.0]
    assert out[3]["decode_ok"] and out[3]["feature"][1:3] == [1024.0, 768.0]
    assert not out[4]["decode_ok"] and out[4]["feature"] is None
    assert not out[5]["decode_ok"] and out[5]["feature"] is None


def test_bpe_ish_tokens(spark):
    df = spark.createDataFrame([("Hello, world! it's 42 deg.",)], ["text"])
    toks = df.select(text.bpe_ish_tokens(F.col("text")).alias("t")).collect()[0]["t"]
    assert toks == ["hello", ",", " world", "!", " it", "'s", " 42", " deg", "."]


def test_rolling_hash_order_sensitive(spark):
    df = spark.createDataFrame([("a b c",), ("c b a",), ("a b c",), ("",)], ["text"])
    vals = [r["h"] for r in df.select(text.rolling_hash(F.col("text")).alias("h")).collect()]
    assert vals[0] == vals[2]          # deterministic
    assert vals[0] != vals[1]          # order matters
    assert vals[3] == 0                # empty → fold init
    assert all(0 <= v < text.ROLL_MOD for v in vals)


def test_sessionize_gap_split(spark):
    from logrange_spark.streaming import sessionize

    rows = [
        # user 1: two events 10 min apart (one session), then a 31-min gap
        (1, "2024-01-01 00:00:00"),
        (1, "2024-01-01 00:10:00"),
        (1, "2024-01-01 00:41:00"),
        # user 2: single event
        (2, "2024-01-01 05:00:00"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "raw"]).select(
        "user_id", F.to_timestamp("raw").alias("t")
    )
    out = sessionize(df, key_col="user_id", ts_col="t").collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r)
    assert len(by_user[1]) == 2
    assert sorted(s["n_events"] for s in by_user[1]) == [1, 2]
    assert len(by_user[2]) == 1 and by_user[2][0]["start_us"] == by_user[2][0]["end_us"]


def test_ivf_topk_recall(vectors):
    """IVF with all lists probed == brute force; fewer probes ⊆ brute force."""
    queries = vectors.where(F.col("vec_id") < 2)
    exact = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in ann.cosine_topk(vectors, queries, k=3).collect()
    }
    full = ann.ivf_topk(vectors, queries, k=3, n_centroids=2, n_probe=2).collect()
    got = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in full}
    assert got == exact  # probing every list is exhaustive
    # single-probe is approximate: still ranked, still ≤ k per query
    part = ann.ivf_topk(vectors, queries, k=3, n_centroids=2, n_probe=1).collect()
    per_q: dict[int, list[int]] = {}
    for r in part:
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    assert set(per_q) <= {0, 1}
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in per_q.values())


def test_ivf_trained_centroids_recall(spark):
    """K-means-trained centroids (the production quantizer) give decent
    recall@10 vs brute force at n_probe=4/16 on the real embeddings
    table. Deterministic: fixed k-means seed."""
    import os

    path = "/root/testdata/sf0.001/embeddings.parquet"
    if not os.path.isdir(path) and not os.path.exists(path):
        import pytest

        pytest.skip("driver testdata not present")
    vecs = spark.read.parquet(path)
    queries = vecs.where(F.col("vec_id") < 5)

    exact = {}
    for r in ann.cosine_topk(vecs, queries, k=10).collect():
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])

    cents = ann.ivf_train_centroids(vecs, n_centroids=16, seed=42)
    assert len(cents) == 16 and all(len(c) == 64 for _, c in cents)
    approx = {}
    for r in ann.ivf_topk(vecs, queries, k=10, n_probe=4, centroids=cents).collect():
        approx.setdefault(r["query_id"], set()).add(r["neighbor_id"])

    recalls = [
        len(exact[q] & approx.get(q, set())) / len(exact[q]) for q in exact
    ]
    mean_recall = sum(recalls) / len(recalls)
    # synthetic embeddings are near-random, so clusters are weak; random
    # probing would give ~n_probe/n_centroids = 0.25. Trained centroids
    # reach ~0.48 (deterministic for the fixed seed) — assert they beat
    # the random baseline by a clear margin.
    assert mean_recall >= 0.4, f"mean recall@10 {mean_recall:.2f} too low"


def test_bucket_dims_occupancy_bounded():
    """Bit count grows with the corpus so expected occupancy stays ~target:
    the fixed-256-bucket design made within-bucket pair work quadratic."""
    assert ann.bucket_dims(0) == 8
    assert ann.bucket_dims(500) == 8          # sf0.01 corpus: unchanged floor
    assert ann.bucket_dims(2_000) == 8        # sf0.1: still the floor
    assert ann.bucket_dims(20_000) == 12      # 10x proof corpus: 4096 buckets
    assert ann.bucket_dims(10**9) == 24       # capped: ~60 rows/bucket
    # occupancy bound holds between floor and cap: n / 2^dims <= target
    for n in (5_000, 50_000, 500_000, 5_000_000):
        d = ann.bucket_dims(n)
        assert n / (1 << d) <= ann.ANN_TARGET_OCCUPANCY


def test_bucketed_topk_recall_near_duplicates(spark):
    """Recall@1 for planted near-duplicates — sign-LSH's actual use case.

    Corpus: 400 seeded-random 64-dim vectors + 100 near-copies (source +
    small noise); each planted query's true nearest neighbor is its
    source (cosine ~0.999). A near-copy flips a sign bit only where the
    source dim is ~0, so with Hamming-1 multi-probe recall@1 must be high
    even at forced-higher dims (the occupancy-bounded growth path).
    Bars: >= 0.9 at the default dims, >= 0.85 at dims=12, and multi-probe
    never below single-probe."""
    import numpy as np

    rng = np.random.default_rng(7)
    base = rng.standard_normal((400, 64))
    dups = base[:100] + 0.05 * rng.standard_normal((100, 64))
    rows = [
        (i, [float(x) for x in v]) for i, v in enumerate(np.vstack([base, dups]))
    ]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = corpus.where(F.col("vec_id") >= 400)

    def recall_at_1(df):
        top1 = {
            r["query_id"]: r["neighbor_id"]
            for r in df.collect()
            if r["rank"] == 1
        }
        # query 400+i's true nearest neighbor is source vector i
        return sum(top1.get(400 + i) == i for i in range(100)) / 100.0

    multi = recall_at_1(ann.bucketed_topk(corpus, queries, k=1))
    single = recall_at_1(ann.bucketed_topk(corpus, queries, k=1, multi_probe=False))
    assert multi >= 0.9, f"multi-probe recall@1 {multi:.2f} below bar"
    assert multi >= single, (multi, single)
    hi_dims = recall_at_1(ann.bucketed_topk(corpus, queries, k=1, dims=12))
    assert hi_dims >= 0.85, f"dims=12 recall@1 {hi_dims:.2f} below bar"


def test_bucketed_topk_multiprobe_beats_single_on_random(spark):
    """On NEAR-RANDOM vectors (the driver's synthetic embeddings, max
    pairwise cosine ~0.48) single-table sign-LSH recall@10 is inherently
    low — bounded by the per-bit collision probability p = 1 - theta/pi
    raised to the bit count (~0.03 single-probe, ~0.12 with Hamming-1
    probes, measured). This test pins the documented floor: multi-probe
    must beat single-probe by >= 2x on the real fixture corpus. High
    recall on random vectors needs many hash tables or IVF — which is
    what ann.ivf_topk is for (its recall test is above)."""
    import os

    path = "/root/testdata/sf0.001/embeddings.parquet"
    if not os.path.isdir(path) and not os.path.exists(path):
        import pytest

        pytest.skip("driver testdata not present")
    vecs = spark.read.parquet(path)
    queries = vecs.where(F.col("vec_id") < 10)

    exact: dict[int, set[int]] = {}
    for r in ann.cosine_topk(vecs, queries, k=10).collect():
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])

    def mean_recall(df):
        approx: dict[int, set[int]] = {}
        for r in df.collect():
            approx.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return sum(
            len(exact[q] & approx.get(q, set())) / len(exact[q]) for q in exact
        ) / len(exact)

    multi = mean_recall(ann.bucketed_topk(vecs, queries, k=10))
    single = mean_recall(ann.bucketed_topk(vecs, queries, k=10, multi_probe=False))
    assert multi >= 2 * single, (multi, single)
    assert multi >= 0.08, f"multi-probe floor regressed: {multi:.3f}"


def test_embedding_near_duplicates_multiprobe_no_dupes_and_superset(vectors):
    """Hamming-1 multi-probe: (a) each pair appears exactly once (the
    one-match-path argument in the docstring), (b) the result is a
    superset of the single-probe pairs, (c) forcing higher dims keeps
    planted duplicate pairs (they agree in every sign bit)."""
    multi = ann.embedding_near_duplicates(vectors, threshold=0.3).collect()
    keys = [(r["id_a"], r["id_b"]) for r in multi]
    assert len(keys) == len(set(keys)), "duplicate pair emitted"
    assert all(a < b for a, b in keys)
    single = {
        (r["id_a"], r["id_b"])
        for r in ann.embedding_near_duplicates(
            vectors, threshold=0.3, multi_probe=False
        ).collect()
    }
    assert single <= set(keys)
    # exact duplicates share every sign bit — found at any dims
    hi = {
        (r["id_a"], r["id_b"])
        for r in ann.embedding_near_duplicates(
            vectors, threshold=0.99, dims=16
        ).collect()
    }
    lo = {
        (r["id_a"], r["id_b"])
        for r in ann.embedding_near_duplicates(
            vectors, threshold=0.99, dims=8
        ).collect()
    }
    assert hi == lo


def test_multimodal_resize_and_frames(docs):
    media = multimodal.attach_binary(docs, "doc_id", "text", kind="image")
    rs = {r["media_id"]: r for r in multimodal.resize(media, 4, 3).collect()}
    assert all(len(r["payload"]) == 12 for r in rs.values())
    assert all(r["meta"]["size_bytes"] == 12 for r in rs.values())
    assert rs[1]["width"] == 4 and rs[1]["height"] == 3

    fr = multimodal.frame_sample(media, every_n_bytes=8, max_frames=3).collect()
    per = {}
    for r in fr:
        per.setdefault(r["media_id"], []).append(r)
    assert all(len(v) <= 3 for v in per.values())
    assert all(r["frame_idx"] < 3 and len(r["frame"]) <= 8 for r in fr)
    # deterministic: same payload → same frames
    f1 = sorted((r["frame_idx"], bytes(r["frame"])) for r in per[1])
    f3 = sorted((r["frame_idx"], bytes(r["frame"])) for r in per[3])
    assert f1 == f3


def test_salted_join_matches_plain_join(spark):
    """salted_join result is identical to the plain join on skewed data
    (90% of left rows share one key)."""
    from logrange_spark.ops.util import salted_join

    left = spark.range(0, 1000).select(
        F.when(F.col("id") < 900, F.lit(7)).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("v"),
    )
    right = spark.range(0, 50).select(
        F.col("id").alias("k"), F.concat(F.lit("r"), F.col("id")).alias("name")
    )
    plain = sorted(
        (r["k"], r["v"], r["name"]) for r in left.join(right, "k").collect()
    )
    salted = sorted(
        (r["k"], r["v"], r["name"]) for r in salted_join(left, right, "k", salts=8).collect()
    )
    assert salted == plain and len(plain) == 1000
    # left join keeps unmatched rows exactly once too
    lj = salted_join(left.withColumn("k", F.col("k") + 1000), right, "k", how="left")
    assert lj.count() == 1000 and lj.where(F.col("name").isNotNull()).count() == 0


def test_salted_join_rejects_right_flavored_joins(spark):
    """right/full joins would replicate each unmatched right row once per
    salt — the operator must refuse rather than silently multiply rows."""
    import pytest

    from logrange_spark.ops.util import salted_join

    left = spark.range(3).select(F.col("id").alias("k"))
    right = spark.range(3).select(F.col("id").alias("k"))
    for how in ("right", "rightouter", "full", "outer", "full_outer", "RIGHT"):
        with pytest.raises(ValueError, match="salted_join"):
            salted_join(left, right, "k", how=how)
    # every Spark-valid left-flavored spelling passes validation
    for how in ("inner", "left", "left_semi", "left_anti", "semi", "anti",
                "LEFT", "Inner", "leftouter"):
        salted_join(left, right, "k", how=how)


def test_hash_split_disjoint_exhaustive_stable(docs):
    from logrange_spark.ops import sampling

    out = sampling.hash_split(docs, "doc_id",
                              {"train": 0.8, "val": 0.1, "test": 0.1})
    rows = {r["doc_id"]: r["split"] for r in out.collect()}
    assert set(rows.values()) <= {"train", "val", "test"}
    assert len(rows) == docs.count()  # every row assigned exactly once
    # deterministic: a second evaluation gives the identical assignment
    rows2 = {r["doc_id"]: r["split"] for r in out.collect()}
    assert rows == rows2
    # growth-stable: assignment of an id doesn't depend on the other rows
    half = docs.where(F.col("doc_id") % 2 == 0)
    sub = {r["doc_id"]: r["split"]
           for r in sampling.hash_split(half, "doc_id",
                                        {"train": 0.8, "val": 0.1, "test": 0.1}).collect()}
    assert all(rows[k] == v for k, v in sub.items())


def test_hash_split_proportions(spark):
    from logrange_spark.ops import sampling

    ids = spark.range(20_000).withColumnRenamed("id", "doc_id")
    out = sampling.hash_split(ids, "doc_id", {"train": 0.9, "val": 0.1})
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert abs(counts["train"] / 20_000 - 0.9) < 0.01
    assert abs(counts["val"] / 20_000 - 0.1) < 0.01


def test_hash_split_validates_fractions(spark):
    import pytest

    from logrange_spark.ops import sampling

    ids = spark.range(5).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError, match="sum to 1"):
        sampling.hash_split(ids, "doc_id", {"a": 0.5, "b": 0.6})


def test_stratified_sample_superset_property(spark):
    """Raising a stratum's fraction only ADDS rows (the per-id bucket is
    independent of the threshold) — the property data-mixture ablations
    rely on."""
    from logrange_spark.ops import sampling

    df = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en").otherwise("es").alias("lang"),
    )
    small = {r["doc_id"] for r in
             sampling.stratified_sample(df, "doc_id", "lang",
                                        {"en": 0.2}, default=0.1).collect()}
    big = {r["doc_id"] for r in
           sampling.stratified_sample(df, "doc_id", "lang",
                                      {"en": 0.6}, default=0.1).collect()}
    assert small < big  # strictly more rows, and a superset


def test_fraction_one_keeps_everything(spark):
    """fraction == 1.0 must keep 100% of rows. The numeric threshold 16^8
    formats as the 9-char '100000000', which sorts BELOW 8-hex buckets
    lexicographically — hex_threshold returns the 'g' sentinel instead."""
    from logrange_spark.ops import sampling

    assert sampling.hex_threshold(1.0) == "g"
    assert sampling.hex_threshold(0.0) == "00000000"
    # every 8-hex bucket sorts strictly below the sentinel
    assert "ffffffff" < "g"

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("es").alias("lang"),
    )
    kept = sampling.stratified_sample(df, "doc_id", "lang", {"en": 1.0},
                                      default=0.0)
    assert kept.count() == df.where(F.col("lang") == "en").count()

    # hash_split: a non-last split whose cumulative fraction reaches 1.0
    # takes every row; the zero-width tail split gets none
    out = sampling.hash_split(df, "doc_id", {"all": 1.0, "none": 0.0})
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert counts == {"all": 1000}


# ------------------------------------------------------------------ PQ
def _pq_corpus(spark, n_base=120, n_dup=30, dim=64, seed=7):
    import numpy as np

    rng = np.random.default_rng(seed)
    base = rng.standard_normal((n_base, dim))
    dups = base[:n_dup] + 0.05 * rng.standard_normal((n_dup, dim))
    rows = [
        (i, [float(x) for x in v]) for i, v in enumerate(np.vstack([base, dups]))
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>"), n_base


def test_pq_encode_is_shuffle_free_and_jvm_side(spark):
    """Encoding 100 TB must be a pure map stage: literal codebooks, no
    Exchange, no Python in the plan."""
    corpus, _ = _pq_corpus(spark)
    books = ann.pq_seed_codebooks(corpus)
    assert len(books) == ann.PQ_SUBSPACES
    assert all(len(b) == ann.PQ_CODES for b in books)
    assert all(len(cv) == 64 // ann.PQ_SUBSPACES for b in books for cv in b)
    plan = (
        ann.pq_encode(corpus, books)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_pq_encode_matches_numpy_reference(spark):
    """Codes are the true per-subspace L2 argmins and recon_norm is the
    reconstruction's norm — checked against a numpy reimplementation."""
    import numpy as np

    corpus, _ = _pq_corpus(spark, n_base=40, n_dup=0)
    books = ann.pq_seed_codebooks(corpus)
    nb = [np.array(b) for b in books]
    vecs = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in corpus.collect()
    }
    subdim = 64 // ann.PQ_SUBSPACES
    for r in ann.pq_encode(corpus, books).collect():
        v = vecs[r["neighbor_id"]]
        expect = [
            int(np.argmin(((nb[s] - v[s * subdim : (s + 1) * subdim]) ** 2).sum(axis=1)))
            for s in range(ann.PQ_SUBSPACES)
        ]
        assert list(r["codes"]) == expect, r["neighbor_id"]
        recon = np.concatenate([nb[s][c] for s, c in enumerate(r["codes"])])
        assert abs(r["recon_norm"] - np.linalg.norm(recon)) < 1e-9


def test_pq_topk_exact_when_codebook_covers_corpus(spark):
    """With the corpus' own vectors as codes (n_codes == n distinct
    vectors), reconstruction is exact, so ADC ranking equals brute
    force — the zero-quantization-error sanity contract."""
    import numpy as np

    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((ann.PQ_CODES, 64))
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = corpus.where(F.col("vec_id") < 3)
    books = ann.pq_seed_codebooks(corpus)  # seeds from ALL 16 vectors
    exact = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in ann.cosine_topk(corpus, queries, k=5).collect()
    }
    got = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in ann.pq_topk(corpus, queries, k=5, codebooks=books).collect()
    }
    assert got == exact


def test_pq_topk_recall_planted_near_duplicates(spark):
    """ADC recall@1 on planted near-duplicates (measured 1.00 with both
    seeded and k-means codebooks on this fixture; bar 0.9 allows noise).
    A near-copy and its source mostly share codes, and background
    vectors' reconstructions are near-orthogonal to the query — so the
    source wins even through 8x compression (64 floats -> 8 codes)."""
    corpus, n_base = _pq_corpus(spark)
    queries = corpus.where(F.col("vec_id") >= n_base)
    books = ann.pq_seed_codebooks(corpus)
    top1 = {
        r["query_id"]: r["neighbor_id"]
        for r in ann.pq_topk(corpus, queries, k=1, codebooks=books).collect()
    }
    n_dup = corpus.count() - n_base
    recall = sum(top1.get(n_base + i) == i for i in range(n_dup)) / float(n_dup)
    assert recall >= 0.9, f"PQ recall@1 {recall:.2f} below bar"


def test_ivf_pq_topk_recall_and_plan(spark):
    """IVF-PQ (prune by inverted list, score by ADC): recall@1 holds at
    partial probe on the planted fixture, and the corpus side of the
    probe join carries no Exchange (assignment + encoding are map-only;
    the only shuffles are the query-side explode/window and final
    top-k)."""
    corpus, n_base = _pq_corpus(spark)
    queries = corpus.where(F.col("vec_id") >= n_base).where(
        F.col("vec_id") < n_base + 10
    )
    books = ann.pq_seed_codebooks(corpus)
    df = ann.ivf_pq_topk(
        corpus, queries, k=1, n_centroids=8, n_probe=4, codebooks=books
    )
    top1 = {r["query_id"]: r["neighbor_id"] for r in df.collect()}
    recall = sum(top1.get(n_base + i) == i for i in range(10)) / 10.0
    assert recall >= 0.8, f"IVF-PQ recall@1 {recall:.2f} below bar"
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_repetition_stats_hand_computed(spark):
    """Gopher repetition signals on a hand-checked fixture."""
    from logrange_spark.ops.text import repetition_stats

    rows = [
        (0, "a b c\na b c\nd e f"),    # 'a b c' twice: 2/3 lines dup, 10/15 chars
        (1, "x y x y x y"),             # 'x y' 3x -> 9 chars over 6 token chars, capped
        (2, "unique line one\nunique line two"),
        (3, ""),
        (4, "solo"),                    # no grams
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert out[0]["n_lines"] == 3
    assert out[0]["dup_line_frac"] == round(1 - 2 / 3, 6)
    assert out[0]["dup_line_char_frac"] == round(10 / 15, 6)
    # tokens a,b,c,a,b,c,d,e,f: top 2-gram 'a b' x2, 2*3 chars over 9
    assert out[0]["top_ngram_char_frac"] == round(6 / 9, 6)
    assert out[1]["dup_line_frac"] == 0.0
    assert out[1]["top_ngram_char_frac"] == 1.0  # overlap-weighted, capped
    assert out[2]["dup_line_frac"] == 0.0 and out[2]["dup_line_char_frac"] == 0.0
    assert out[3]["n_lines"] == 0 and out[3]["top_ngram_char_frac"] == 0.0
    assert out[4]["top_ngram_char_frac"] == 0.0
    # pure map stage: no shuffle, no Python
    plan = repetition_stats(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_redact_hand_cases(spark):
    from logrange_spark.ops.text import redact

    rows = [
        (0, "mail a.b+c@foo-bar.co.uk and 192.168.1.255 then 123456789 done"),
        (1, "no pii here, short 12345678 number stays"),
        (2, "two mails x@y.io z@w.ai; bad ip 999.999.999.999 still matches shape"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in redact(df).collect()}
    assert out[0]["redacted"] == "mail <EMAIL> and <IP> then <NUM> done"
    assert (out[0]["n_emails"], out[0]["n_ips"], out[0]["n_longnums"]) == (1, 1, 1)
    # 8-digit run is below the 9-digit bar and survives
    assert out[1]["redacted"] == rows[1][1]
    assert out[2]["n_emails"] == 2 and out[2]["n_ips"] == 1
    plan = redact(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "BatchEvalPython" not in plan


def test_bmp_resize_real_codec_end_to_end(spark):
    """The BMP pixel path is REAL: a synthesized 24-bit BMP goes through
    the Spark resize operator (mapInPandas) with real_codec=True and the
    output decodes to the exact nearest-neighbor resample; non-BMP
    payloads fall back to the deterministic stub without error."""
    import numpy as np

    from logrange_spark.ops import multimodal as mm

    rng = np.random.default_rng(11)
    arr = rng.integers(0, 256, size=(6, 8, 3), dtype=np.uint8)
    bmp = mm.encode_bmp24(arr)
    rows = [(1, bmp), (2, b"not a bmp at all" * 4), (3, None)]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r["media_id"]: r for r in mm.resize(media, 4, 3, real_codec=True).collect()}

    got = mm.decode_bmp24(bytes(out[1]["payload"]))
    yi = (np.arange(3) * 6 // 3).clip(0, 5)
    xi = (np.arange(4) * 8 // 4).clip(0, 7)
    assert got is not None and (got == arr[yi][:, xi]).all()
    assert out[1]["width"] == 4 and out[1]["height"] == 3
    # non-BMP fell back to the stub (truncate/pad to w*h)
    assert len(out[2]["payload"]) == 4 * 3
    assert out[3]["payload"] is None

    # codec totality on hostile bytes
    for junk in (b"", b"BM", b"BM" + bytes(60), bmp[:30], bmp[:-5], bytes(200)):
        assert mm.resize_nearest_bmp24(junk, 2, 2) is None


def test_pq_entry_points_validate_missing_corpus(spark):
    """corpus=None without precomputed artifacts must raise a clear
    ValueError, not AttributeError; pq_seed_codebooks must reject a
    corpus whose ids don't densely cover [0, n_codes)."""
    corpus, _ = _pq_corpus(spark)
    queries = corpus.limit(2)
    with pytest.raises(ValueError, match="corpus"):
        ann.pq_topk(None, queries)
    with pytest.raises(ValueError, match="corpus"):
        ann.ivf_pq_topk(None, queries)
    with pytest.raises(ValueError, match="seed rows"):
        ann.pq_seed_codebooks(corpus.where(F.col("vec_id") % 2 == 0))
    with pytest.raises(ValueError, match="corpus"):
        ann.pq_seed_codebooks(None)


def test_skew_hardened_dedup_output_invariant(spark, monkeypatch):
    """The exact-collapse + grid-salting machinery must be output-
    invariant: a planted duplicate cluster plus near-identical variants
    produce the same candidate/near-dup/simhash pair sets whether the
    salting grid is 1x1 (huge cap) or heavily split (cap=2), and the
    within/cross expansion must agree with a brute-force reference."""
    base = [
        (i, f"the quick brown fox jumps over the lazy dog number {i} "
            f"with extra words {i * 7} and {i * 13}")
        for i in range(20)
    ]
    # exact cluster: 15 copies of doc 100's text
    cluster = [(100 + j, "copy copy cluster text shared by many documents here")
               for j in range(15)]
    # near-identical cluster: one token differs per doc
    near = [(200 + j, f"almost identical long document body text varies v{j}")
            for j in range(10)]
    df = spark.createDataFrame(base + cluster + near, "doc_id long, text string")

    def snap():
        cand = sorted(
            (r["id_a"], r["id_b"])
            for r in dedup.lsh_candidate_pairs(df, "doc_id", "text").collect()
        )
        nd = sorted(
            (r["id_a"], r["id_b"], r["jaccard"])
            for r in dedup.near_duplicates(df, "doc_id", "text", 0.5).collect()
        )
        sh = sorted(
            (r["id_a"], r["id_b"], r["hamming"])
            for r in dedup.simhash_near_pairs(df, "doc_id", "text").collect()
        )
        return cand, nd, sh

    monkeypatch.setattr(dedup, "SKEW_CAP", 10**9)
    plain = snap()
    monkeypatch.setattr(dedup, "SKEW_CAP", 2)
    salted = snap()
    assert plain == salted

    cand, nd, sh = plain
    # every within-cluster pair of the 15-copy cluster is a candidate and
    # a near-duplicate with jaccard exactly 1.0
    cluster_ids = [100 + j for j in range(15)]
    for i, a in enumerate(cluster_ids):
        for b in cluster_ids[i + 1:]:
            assert (a, b) in cand
            assert (a, b, 1.0) in nd
            assert (a, b, 0) in sh
    assert len(set(cand)) == len(cand)  # expansion introduced no dupes
    assert len(set((a, b) for a, b, _ in nd)) == len(nd)
    assert len(set((a, b) for a, b, _ in sh)) == len(sh)
    # the near cluster: one-token deltas are near-dups at 0.5
    assert (200, 201) in [(a, b) for a, b, _ in nd]


def test_ann_default_nrows_reads_parquet_footers_not_a_count_job(
    spark, tmp_path, monkeypatch
):
    """Omitting n_rows must not launch a count() job for a file-backed
    corpus: occupancy sizing reads the parquet footers driver-side. The
    footer sum must equal the real count for a bare scan."""
    import numpy as np
    from pyspark.sql import DataFrame as _DF

    rng = np.random.default_rng(7)
    rows = [(i, [float(x) for x in rng.normal(size=16)]) for i in range(300)]
    spark.createDataFrame(rows, "vec_id long, embedding array<float>").repartition(
        3
    ).write.parquet(str(tmp_path / "emb.parquet"))
    corpus = spark.read.parquet(str(tmp_path / "emb.parquet"))
    assert ann._default_nrows(corpus) == 300

    def _no_count(self):
        raise AssertionError("count() job launched for a file-backed corpus")

    monkeypatch.setattr(_DF, "count", _no_count)
    # building both operators without n_rows must not trigger count()
    ann.bucketed_topk(corpus, corpus.limit(2), k=3)
    ann.embedding_near_duplicates(corpus, threshold=0.9)
    monkeypatch.undo()
    # in-memory frames (no input files) still fall back to count()
    mem = spark.createDataFrame(rows[:50], "vec_id long, embedding array<float>")
    assert ann._default_nrows(mem) == 50


def test_jpeg_codec_roundtrip_matches_numpy_reference():
    """The baseline JPEG codec is REAL: encode→decode at quant=1 differs
    from the source pixels only by DCT rounding (±2); 4:2:0 subsampling
    and restart markers decode correctly; quantization loss is bounded."""
    import numpy as np

    from logrange_spark.ops import jpeg

    h, w = 37, 50
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.dstack(
        [(xx * 255 / w), (yy * 255 / h), ((xx + yy) * 127 / (w + h))]
    ).astype(np.uint8)
    noise = np.random.default_rng(3).integers(0, 256, (16, 24, 3), dtype=np.uint8)

    for src in (img, noise):
        dec = jpeg.decode_jpeg(jpeg.encode_jpeg(src, quant=1))
        assert dec is not None and dec.shape == src.shape
        assert np.abs(dec.astype(int) - src.astype(int)).max() <= 2

    # 4:2:0: chroma is 2x2-averaged, so only bounded loss — luma near-exact
    dec420 = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quant=1, subsample=True))
    assert dec420 is not None and dec420.shape == img.shape
    assert np.abs(dec420.astype(int) - img.astype(int)).mean() < 4

    # restart markers: byte-aligned RSTn resync + DC predictor reset
    decr = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quant=1, restart_interval=3))
    assert decr is not None
    assert np.abs(decr.astype(int) - img.astype(int)).max() <= 2


def test_jpeg_codec_total_on_hostile_bytes():
    """decode_jpeg never raises: junk, truncations at every segment
    boundary, bit-garbage entropy data, and progressive streams all
    return None."""
    import numpy as np

    from logrange_spark.ops import jpeg

    img = np.full((9, 13, 3), 77, dtype=np.uint8)
    enc = jpeg.encode_jpeg(img)
    for junk in (None, b"", b"\xff", b"\xff\xd8", bytes(64), b"\xff" * 64,
                 bytes(reversed(enc))):
        assert jpeg.decode_jpeg(junk) is None
    for cut in range(0, len(enc), 7):
        jpeg.decode_jpeg(enc[:cut])  # must not raise (None or partial-fail)
    # a SOF2 header on a baseline full-band scan is MALFORMED progressive
    # (a progressive DC scan must have Se=0) → rejected, not garbled
    prog = enc.replace(b"\xff\xc0", b"\xff\xc2", 1)
    assert jpeg.decode_jpeg(prog) is None
    # hostile-header allocation guard: a tiny payload declaring a
    # 65500x65500 frame must return None IMMEDIATELY (pre-guard this
    # allocated ~67M python lists — minutes of CPU — before any scan)
    import struct as _struct
    import time as _time

    bomb = (b"\xff\xd8"
            + _struct.pack(">HH", 0xFFC0, 17)
            + _struct.pack(">BHHB", 8, 65500, 65500, 3)
            + bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1])
            + b"\xff\xd9")
    t0 = _time.time()
    assert jpeg.decode_jpeg(bomb) is None
    assert _time.time() - t0 < 1.0
    # arithmetic-coded / lossless SOFs stay out of scope
    assert jpeg.decode_jpeg(enc.replace(b"\xff\xc0", b"\xff\xc9", 1)) is None
    assert jpeg.decode_jpeg(enc.replace(b"\xff\xc0", b"\xff\xc3", 1)) is None


def test_jpeg_progressive_roundtrip_matches_numpy_reference():
    """The SOF2 decoder is REAL: a full progressive stream (spectral
    selection + successive approximation, T.81 G.1.2) reconstructs the
    coefficients exactly at quant=1, so decode differs from the source
    only by DCT rounding — same ±2 bound as the baseline codec. 4:2:0
    subsampling (interleaved DC scan over a padded MCU grid +
    non-interleaved AC scans over the component grid) and restart
    markers (DC-pred and EOB-run reset per interval) also roundtrip."""
    import numpy as np

    from logrange_spark.ops import jpeg

    h, w = 37, 50
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.dstack(
        [(xx * 255 / w), (yy * 255 / h), ((xx + yy) * 127 / (w + h))]
    ).astype(np.uint8)
    noise = np.random.default_rng(5).integers(0, 256, (16, 24, 3), dtype=np.uint8)

    for src in (img, noise):
        dec = jpeg.decode_jpeg(jpeg.encode_jpeg_progressive(src, quant=1))
        assert dec is not None and dec.shape == src.shape
        assert np.abs(dec.astype(int) - src.astype(int)).max() <= 2

    dec420 = jpeg.decode_jpeg(jpeg.encode_jpeg_progressive(img, quant=1, subsample=True))
    assert dec420 is not None and np.abs(dec420.astype(int) - img.astype(int)).mean() < 4
    decr = jpeg.decode_jpeg(jpeg.encode_jpeg_progressive(img, quant=1, restart_interval=3))
    assert decr is not None and np.abs(decr.astype(int) - img.astype(int)).max() <= 2
    # heavier quantization exercises long EOB runs + ZRL in refinement
    decq = jpeg.decode_jpeg(jpeg.encode_jpeg_progressive(img, quant=8))
    assert decq is not None and np.abs(decq.astype(int) - img.astype(int)).mean() < 4


def test_jpeg_progressive_partial_scans_and_hostile_bytes():
    """Progressive semantics: truncating the scan sequence (cut + EOI)
    still decodes, with error decreasing as scans are added — the
    coarse-to-fine contract browsers rely on. And the decoder stays
    TOTAL under truncation and bit flips of a real SOF2 stream."""
    import numpy as np

    from logrange_spark.ops import jpeg

    img = np.random.default_rng(11).integers(0, 256, (21, 33, 3), dtype=np.uint8)
    enc = jpeg.encode_jpeg_progressive(img, quant=2)
    offs = []
    i = 0
    while (j := enc.find(b"\xff\xda", i)) >= 0:
        offs.append(j)
        i = j + 2
    assert len(offs) == 10
    errs = []
    for k in (1, 3, 5, 10):
        part = (enc[: offs[k]] + b"\xff\xd9") if k < 10 else enc
        dec = jpeg.decode_jpeg(part)
        assert dec is not None and dec.shape == img.shape
        errs.append(float(np.abs(dec.astype(int) - img.astype(int)).mean()))
    assert errs[0] > errs[1] > errs[2] > errs[3]  # refinement converges
    assert errs[3] <= 2.0  # full stream: DCT/quant rounding only
    for cut in range(0, len(enc), 7):
        jpeg.decode_jpeg(enc[:cut])  # must not raise
    for pos in range(0, len(enc), 11):
        bad = bytearray(enc)
        bad[pos] ^= 0x55
        jpeg.decode_jpeg(bytes(bad))  # must not raise


def test_jpeg_resize_real_codec_matches_bmp_reference(spark):
    """VERDICT round-6 item #4: the SAME pixel array goes through the
    Spark resize operator twice — once as BMP (exact reference path),
    once as a near-lossless baseline JPEG — and the two outputs agree
    within codec rounding. Junk payloads still fall back to the stub."""
    import numpy as np

    from logrange_spark.ops import jpeg
    from logrange_spark.ops import multimodal as mm

    rng = np.random.default_rng(21)
    arr = rng.integers(0, 256, size=(12, 16, 3), dtype=np.uint8)
    bmp = mm.encode_bmp24(arr[..., ::-1])  # BMP codec is BGR
    jpg = jpeg.encode_jpeg(arr, quant=1)
    rows = [(1, bmp), (2, bytes(jpg)), (3, b"junk" * 10)]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {
        r["media_id"]: r
        for r in mm.resize(media, 8, 6, real_codec=True).collect()
    }

    ref = mm.decode_bmp24(bytes(out[1]["payload"]))[..., ::-1]  # BGR→RGB
    got = jpeg.decode_jpeg(bytes(out[2]["payload"]))
    assert got is not None and got.shape == ref.shape == (6, 8, 3)
    # two near-lossless JPEG trips (decode + re-encode) vs exact BMP path
    assert np.abs(got.astype(int) - ref.astype(int)).max() <= 4
    assert len(out[3]["payload"]) == 8 * 6  # stub fallback intact


def _png_with_filters(arr, filters):
    """Build a valid PNG whose row y uses filters[y % len] — reference
    filter computation straight from the PNG spec, so the decoder's
    Sub/Up/Average/Paeth reconstruction is tested against ground truth."""
    import struct
    import zlib

    import numpy as np

    h, w, c = arr.shape
    a = arr.astype(np.int32)
    raw = bytearray()
    for y in range(h):
        f = filters[y % len(filters)]
        row = a[y].reshape(-1)
        prev = a[y - 1].reshape(-1) if y else np.zeros(w * c, dtype=np.int32)
        left = np.concatenate([np.zeros(c, dtype=np.int32), row[:-c]])
        ul = np.concatenate([np.zeros(c, dtype=np.int32), prev[:-c]])
        if f == 0:
            out = row
        elif f == 1:
            out = row - left
        elif f == 2:
            out = row - prev
        elif f == 3:
            out = row - ((left + prev) >> 1)
        else:
            p = left + prev - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul))
            out = row - pred
        raw.append(f)
        raw += bytes((out % 256).astype(np.uint8))

    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2 if c == 3 else 6, 0, 0, 0)
    return sig + chunk(b"IHDR", ihdr) + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b"")


def test_png_codec_all_filters_and_color_types():
    """decode_png reconstructs every scanline filter (None/Sub/Up/
    Average/Paeth) exactly, handles RGBA (white-composite), and the
    encode→decode roundtrip is lossless; hostile bytes return None."""
    import numpy as np

    from logrange_spark.ops import png

    rng = np.random.default_rng(5)
    arr = rng.integers(0, 256, size=(11, 7, 3), dtype=np.uint8)
    for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
        dec = png.decode_png(_png_with_filters(arr, filters))
        assert dec is not None and (dec == arr).all(), f"filters {filters}"

    # lossless roundtrip through our own encoder
    dec = png.decode_png(png.encode_png(arr))
    assert dec is not None and (dec == arr).all()

    # RGBA composites over white: alpha 0 → 255, alpha 255 → own value
    rgba = np.zeros((2, 2, 4), dtype=np.uint8)
    rgba[..., :3] = 10
    rgba[0, :, 3] = 255
    rgba[1, :, 3] = 0
    dec = png.decode_png(_png_with_filters(rgba, [0]))
    assert (dec[0] == 10).all() and (dec[1] == 255).all()

    # totality (a truncation that only drops the trailing IEND CRC still
    # decodes — tolerant-decoder behavior; cutting into IDAT must not)
    enc = png.encode_png(arr)
    for junk in (None, b"", b"\x89PNG", bytes(80), enc[:20],
                 enc[: len(enc) // 2], bytes(reversed(enc))):
        assert png.decode_png(junk) is None
    for cut in range(0, len(enc), 11):
        png.decode_png(enc[:cut])  # must not raise


def test_png_deflate_bomb_rejected():
    """A PNG declaring tiny dimensions but carrying a huge deflate stream
    must be rejected without inflating past the declared raster size
    (driver ADVICE r7: zlib.decompress had no output cap). Absurd
    declared dimensions (> 1 GiB raster) are rejected before inflate."""
    import struct
    import tracemalloc
    import zlib

    from logrange_spark.ops import png

    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    sig = b"\x89PNG\r\n\x1a\n"
    # declares 2x2 RGB (need = 2*(6+1)=14 bytes) but IDAT inflates to 64 MiB
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    bomb = sig + chunk(b"IHDR", ihdr) + chunk(
        b"IDAT", zlib.compress(bytes(64 * 1024 * 1024), 9)
    ) + chunk(b"IEND", b"")
    tracemalloc.start()
    assert png.decode_png(bomb) is None
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert peak < 8 * 1024 * 1024, peak  # never materialized the 64 MiB

    # declared-dimension ceiling: 1 GiB+ raster rejected outright
    huge = struct.pack(">IIBBBBB", 1 << 15, 1 << 15, 8, 2, 0, 0, 0)
    big = sig + chunk(b"IHDR", huge) + chunk(
        b"IDAT", zlib.compress(b"\x00" * 100)
    ) + chunk(b"IEND", b"")
    assert png.decode_png(big) is None

    # a correct stream that merely has TRAILING garbage output is overlong
    raw = b"\x00" * 14  # 2 rows of (filter byte + 6 RGB bytes)
    over = sig + chunk(b"IHDR", ihdr) + chunk(
        b"IDAT", zlib.compress(raw + b"X")
    ) + chunk(b"IEND", b"")
    assert png.decode_png(over) is None


def test_png_resize_real_codec_matches_bmp_reference(spark):
    """Same-pixels PNG and BMP through the Spark resize operator agree
    EXACTLY — PNG is lossless, so unlike JPEG there is no tolerance."""
    import numpy as np

    from logrange_spark.ops import multimodal as mm
    from logrange_spark.ops import png

    rng = np.random.default_rng(31)
    arr = rng.integers(0, 256, size=(10, 14, 3), dtype=np.uint8)
    rows = [(1, mm.encode_bmp24(arr[..., ::-1])), (2, png.encode_png(arr))]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r["media_id"]: r for r in mm.resize(media, 7, 5, real_codec=True).collect()}
    ref = mm.decode_bmp24(bytes(out[1]["payload"]))[..., ::-1]
    got = png.decode_png(bytes(out[2]["payload"]))
    assert got is not None and (got == ref).all()


def test_near_duplicate_drops_equals_pair_based_dropset(spark):
    """The O(n)-output drop set must equal the pair-materializing path's
    id_b set exactly — including duplicate clusters and chained
    similarity — at a tiny salting cap too."""
    rows = (
        [(i, f"base document number {i} with several tokens {i * 3} {i * 7}")
         for i in range(15)]
        + [(100 + j, "identical boilerplate cluster text body") for j in range(6)]
        + [(200 + j, f"almost identical drifting text version v{j}") for j in range(5)]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for cap in (10**9, 2):
        import logrange_spark.ops.dedup as dd

        old = dd.SKEW_CAP
        dd.SKEW_CAP = cap
        try:
            via_pairs = {
                r["id_b"]
                for r in dd.near_duplicates(df, "doc_id", "text", 0.5).collect()
            }
            direct = {
                r["doc_id"]
                for r in dd.near_duplicate_drops(df, "doc_id", "text", 0.5).collect()
            }
        finally:
            dd.SKEW_CAP = old
        assert direct == via_pairs


def test_pixel_features_real_decode_all_formats(spark):
    """pixel_features computes features from REAL decoded pixels for
    BMP, PNG and baseline JPEG — numpy-verified on a known image; a
    non-decodable payload comes back decode_ok=False."""
    import numpy as np

    from logrange_spark.ops import jpeg, png
    from logrange_spark.ops import multimodal as mm

    rng = np.random.default_rng(13)
    arr = rng.integers(0, 256, size=(9, 12, 3), dtype=np.uint8)
    rows = [
        (1, mm.encode_bmp24(arr[..., ::-1])),
        (2, png.encode_png(arr)),
        (3, bytes(jpeg.encode_jpeg(arr, quant=1))),
        (4, b"not an image"),
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r["media_id"]: r for r in mm.pixel_features(media).collect()}

    f = arr.astype(np.float64)
    luma = 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
    want = [f[..., 0].mean(), f[..., 1].mean(), f[..., 2].mean(),
            luma.std(), luma.mean(), np.abs(np.diff(luma, axis=1)).mean(),
            12 / 9, np.log2(9 * 12)]
    # BMP and PNG are lossless → exact (to float32 storage); JPEG within
    # its quant=1 rounding
    for mid, tol in ((1, 1e-4), (2, 1e-4), (3, 1.5)):
        assert out[mid]["decode_ok"], mid
        got = out[mid]["feature"]
        assert len(got) == mm.FEATURE_DIM
        assert all(abs(g - w) <= tol for g, w in zip(got, want)), (mid, got, want)
    assert not out[4]["decode_ok"] and out[4]["feature"] is None


def _wav_pcm16(samples, rate=8000, channels=1):
    import struct

    import numpy as np

    x = (np.clip(samples, -1, 1) * 32767).astype(np.int16)
    if channels > 1:
        x = np.repeat(x[:, None], channels, axis=1)
    data = x.tobytes()
    block = channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * block, block, 16)
    body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def test_audio_features_real_pcm_decode(spark):
    """audio_features computes rms/zcr/dominant-frequency from REAL
    decoded PCM: a 440 Hz sine must report ~440 Hz dominant frequency
    and the analytic rms; stereo mixes down; junk is decode_ok=False."""
    import numpy as np

    from logrange_spark.ops import multimodal as mm

    rate, dur = 8000, 1.0
    t = np.arange(int(rate * dur)) / rate
    sine = 0.5 * np.sin(2 * np.pi * 440 * t)
    rows = [
        (1, _wav_pcm16(sine, rate)),
        (2, _wav_pcm16(sine, rate, channels=2)),
        (3, b"RIFF junk not a wav"),
        (4, b"\x00" * 64),
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r["media_id"]: r for r in mm.audio_features(media).collect()}

    for mid in (1, 2):
        assert out[mid]["decode_ok"], mid
        f = out[mid]["feature"]
        rms, zcr, dom, centroid, peak, dur_s, srate, _ = f
        assert abs(rms - 0.5 / np.sqrt(2)) < 0.01      # sine rms = A/√2
        assert abs(dom - 440.0) < 2.0                  # dominant bin
        assert abs(zcr - 2 * 440 / rate) < 0.01        # 2 crossings/cycle
        assert abs(dur_s - 1.0) < 1e-6 and srate == rate
        assert abs(peak - 0.5) < 0.01
    assert not out[3]["decode_ok"] and not out[4]["decode_ok"]

    # direct numpy check of the mono mixdown path
    x, r = mm.decode_wav_pcm(_wav_pcm16(sine, rate, channels=2))
    assert r == rate and abs(float(np.abs(x - sine[: len(x)]).max())) < 1e-3


def test_gif_codec_and_real_frame_sample(spark):
    """The GIF codec is REAL (LZW + compositing): encode→decode is exact
    for paletted frames, interlace/transparency paths hold, and
    frame_sample(real_codec=True) emits each animated-GIF frame as a
    lossless PNG row while non-GIF payloads keep the stub fan-out."""
    import numpy as np

    from logrange_spark.ops import gif, png
    from logrange_spark.ops import multimodal as mm

    rng = np.random.default_rng(9)
    f1 = (rng.integers(0, 4, size=(11, 14, 3)) * 85).astype(np.uint8)
    f2 = (rng.integers(0, 4, size=(11, 14, 3)) * 85).astype(np.uint8)
    f3 = (rng.integers(0, 4, size=(11, 14, 3)) * 85).astype(np.uint8)
    anim = gif.encode_gif([f1, f2, f3])

    # exact multi-frame roundtrip
    frames = gif.decode_gif_frames(anim)
    assert len(frames) == 3
    assert all((g == w).all() for g, w in zip(frames, (f1, f2, f3)))

    # totality
    for junk in (None, b"", b"GIF89a", bytes(50), anim[:25], bytes(reversed(anim))):
        assert gif.decode_gif(junk) is None
    for cut in range(0, len(anim), 17):
        gif.decode_gif(anim[:cut])  # never raises

    # Spark frame_sample: real frames for the GIF, stub for junk
    media = spark.createDataFrame(
        [(1, bytes(anim)), (2, b"x" * 48)], "media_id long, payload binary"
    )
    out = mm.frame_sample(media, every_n_bytes=16, max_frames=2, real_codec=True).collect()
    got = {(r["media_id"], r["frame_idx"]): bytes(r["frame"]) for r in out}
    assert set(got) == {(1, 0), (1, 1), (2, 0), (2, 1)}  # max_frames caps the GIF
    dec0 = png.decode_png(got[(1, 0)])
    dec1 = png.decode_png(got[(1, 1)])
    assert (dec0 == f1).all() and (dec1 == f2).all()
    assert len(got[(2, 0)]) == 16  # stub slice

    # resize + pixel dispatch cover GIF too
    rz = gif.decode_gif(gif.resize_nearest_gif(bytes(anim), 7, 5))
    yi = (np.arange(5) * 11 // 5).clip(0, 10)
    xi = (np.arange(7) * 14 // 7).clip(0, 13)
    assert (rz == f1[yi][:, xi]).all()
    assert (mm.decode_pixels(bytes(anim)) == f1).all()


def test_embedding_near_duplicates_duplicate_vector_cluster(spark, monkeypatch):
    """Byte-identical embeddings (duplicate documents) collapse to one
    bucket-join row and expand back: every within-cluster pair appears
    with the exact self-score, cross pairs match the uncollapsed
    semantics, and the output is invariant under a tiny salting cap."""
    import numpy as np

    import logrange_spark.ops.dedup as dd

    rng = np.random.default_rng(17)
    base = [(i, [float(x) for x in rng.normal(size=16)]) for i in range(20)]
    dupvec = [float(x) for x in rng.normal(size=16)]
    cluster = [(100 + j, list(dupvec)) for j in range(8)]
    near = (np.array(dupvec) + 1e-4).tolist()  # near but not identical
    rows = base + cluster + [(200, [float(x) for x in near])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    def snap():
        return sorted(
            (r["id_a"], r["id_b"], r["score"])
            for r in ann.embedding_near_duplicates(df, threshold=0.95).collect()
        )

    out = snap()
    monkeypatch.setattr(dd, "SKEW_CAP", 2)
    assert snap() == out
    monkeypatch.undo()

    pairs = {(a, b) for a, b, _ in out}
    scores = {(a, b): s for a, b, s in out}
    cluster_ids = [100 + j for j in range(8)]
    for i, a in enumerate(cluster_ids):
        for b in cluster_ids[i + 1:]:
            assert (a, b) in pairs
            assert scores[(a, b)] == scores[(100, 101)]  # one self-score
    # the near-identical outsider pairs with every cluster member
    assert all((m, 200) in pairs for m in cluster_ids)
    assert len(pairs) == len(out)  # no duplicate emissions


def test_pack_sequences_bins_respect_budget(spark):
    """Sequence packing: every document lands in exactly one bin, no bin
    exceeds the token budget (except a dedicated bin for an oversized
    document), offsets are contiguous prefix sums within each bin, the
    result is deterministic, and utilization is high on packable data."""
    from collections import defaultdict

    from logrange_spark.ops.sampling import pack_sequences

    rows = [(i, 50 + (i * 37) % 900) for i in range(400)] + [(999, 5000)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = pack_sequences(df, max_tokens=2048, partitions=4).collect()
    out2 = pack_sequences(df, max_tokens=2048, partitions=4).collect()
    key = lambda r: (r["doc_id"], r["bin_id"], r["bin_offset"])  # noqa: E731
    assert sorted(map(key, out)) == sorted(map(key, out2))  # deterministic

    assert sorted(r["doc_id"] for r in out) == sorted(i for i, _ in rows)
    bins = defaultdict(list)
    for r in out:
        bins[r["bin_id"]].append((r["bin_offset"], r["n_tokens"], r["doc_id"]))
    for bid, docs in bins.items():
        docs.sort()
        total = sum(n for _, n, _ in docs)
        if total > 2048:  # only the oversized doc's dedicated bin
            assert len(docs) == 1 and docs[0][2] == 999
        # offsets are the prefix sums of the bin's documents
        off = 0
        for o, n, _ in docs:
            assert o == off
            off += n
    # utilization: non-oversized bins should average well above half full
    fills = [sum(n for _, n, _ in d) for b, d in bins.items() if len(d) > 1 or d[0][2] != 999]
    assert sum(fills) / (len(fills) * 2048) > 0.7, sum(fills) / (len(fills) * 2048)


# ------------------------------------------------- duplicate clustering (CC)
def _uf_components(edges):
    """Python union-find reference: node -> min id of its component."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    out = {}
    for node in {x for e in edges for x in e}:
        out[node] = find(node)
    return out


@pytest.mark.parametrize(
    "name,edges",
    [
        # chain: worst case for O(diameter) label propagation — the star
        # contraction must still converge inside CC_MAX_ITERS rounds
        ("chain", [(i, i + 1) for i in range(60)]),
        ("clique", [(i, j) for i in range(12) for j in range(i + 1, 12)]),
        (
            "bridged-cliques",
            [(i, j) for i in range(6) for j in range(i + 1, 6)]
            + [(10 + i, 10 + j) for i in range(6) for j in range(i + 1, 6)]
            + [(5, 10)],
        ),
        ("self-loops-and-dups", [(3, 3), (1, 2), (2, 1), (1, 2), (7, 9)]),
    ],
)
def test_connected_components_vs_union_find(spark, name, edges):
    ref = _uf_components([(a, b) for a, b in edges if a != b])
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["component"]
        for r in dedup.connected_components(e).collect()
    }
    assert got == ref, name


def test_connected_components_random_graphs(spark):
    import random

    rng = random.Random(11)
    for _ in range(3):
        edges = [
            (rng.randrange(150), rng.randrange(150)) for _ in range(120)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        ref = _uf_components(edges)
        e = spark.createDataFrame(edges, "src long, dst long")
        got = {
            r["node"]: r["component"]
            for r in dedup.connected_components(e).collect()
        }
        assert got == ref


def test_connected_components_empty(spark):
    e = spark.createDataFrame([], "src long, dst long")
    out = dedup.connected_components(e)
    assert out.columns == ["node", "component"]
    assert out.count() == 0


def test_near_duplicate_clusters_on_fixture(docs):
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.near_duplicate_clusters(
            docs, "doc_id", "text", threshold=0.5
        ).collect()
    }
    # 1,2,3 are one near-dup cluster (1-3 exact, 1-2 near); 4, 5 distinct
    # content; 6 is empty (below SHINGLE_N tokens) → singleton cluster
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 6: 6}


def test_near_duplicate_clusters_transitive_chain(spark):
    """A~B and B~C above threshold, A~C below: transitive closure must
    still put all three in ONE cluster — the semantics direct pair
    filtering cannot express."""
    base = [f"tok{i}" for i in range(20)]
    b = ["alt0", "alt1", "alt2"] + base[3:]
    c = ["alt0", "alt1", "alt2", "alt3", "alt4", "alt5"] + base[6:]
    rows = [
        (1, " ".join(base)),
        (2, " ".join(b)),
        (3, " ".join(c)),
        (4, "unrelated text about completely other things entirely"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # pin the premise: direct pairs hold A~B, B~C but NOT A~C at 0.7
    j = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.near_duplicates(df, "doc_id", "text", 0.7).collect()
    }
    assert (1, 2) in j and (2, 3) in j and (1, 3) not in j, j
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.near_duplicate_clusters(
            df, "doc_id", "text", threshold=0.7
        ).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 4}


def test_near_duplicate_clusters_drops_invariant(spark):
    """Keep-first drops are always a subset of the clusters' non-min
    members (transitivity can only merge clusters, never split), and the
    cluster id is the component minimum."""
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    )
    rows = dedup.near_duplicate_clusters(docs, "doc_id", "text", 0.8).collect()
    from collections import defaultdict

    groups = defaultdict(list)
    for r in rows:
        groups[r["cluster_id"]].append(r["doc_id"])
    assert all(cid == min(mem) for cid, mem in groups.items())
    non_min = {x for mem in groups.values() for x in mem if x != min(mem)}
    drops = {
        r[0]
        for r in dedup.near_duplicate_drops(docs, "doc_id", "text", 0.8).collect()
    }
    assert drops <= non_min
    assert len(rows) == docs.count()  # every doc labeled, singletons included


# ------------------------------------------------------- mixture resampling
def _mix_reference(rows, weights, total, salt=""):
    """Python twin of mixture_sample: (id, domain, copy) triples."""
    import hashlib
    from collections import Counter

    from logrange_spark.ops import sampling

    counts = Counter(d for _, d in rows)
    wsum = sum(weights.values())
    out = []
    for i, d in rows:
        if d not in weights or not counts[d]:
            continue
        r = (total * weights[d] / wsum) / counts[d]
        b = hashlib.md5(f"{salt}|{i}".encode()).hexdigest()[:8]
        thr = sampling.hex_threshold(r - int(r))
        k = int(r) + (1 if b < thr else 0)
        out.extend((i, d, c) for c in range(k))
    return sorted(out)


def test_mixture_sample_matches_reference(spark):
    from logrange_spark.ops import sampling

    rows = [(i, ["web", "code", "books"][i % 3]) for i in range(600)]
    df = spark.createDataFrame(rows, "doc_id long, domain string")
    weights = {"web": 0.7, "code": 0.2, "books": 0.1}
    out = sampling.mixture_sample(df, "doc_id", "domain", weights, total=600)
    got = sorted(
        (r["doc_id"], r["domain"], r["copy"]) for r in out.collect()
    )
    assert got == _mix_reference(rows, weights, 600)
    # the 0.7-weight domain has only 200 of the 420 target rows available
    # → rate 2.1: every web row appears 2 or 3 times (up-sampling epochs)
    from collections import Counter

    per_doc = Counter((i, d) for i, d, _ in got)
    web_counts = {v for (i, d), v in per_doc.items() if d == "web"}
    assert web_counts <= {2, 3} and 3 in web_counts
    # down-sampled domain: 0 or 1 copies only
    books_counts = {v for (i, d), v in per_doc.items() if d == "books"}
    assert books_counts == {1}
    # realized mixture tracks the target within sampling noise
    n_by = Counter(d for _, d, _ in got)
    assert abs(n_by["web"] - 420) <= 25 and abs(n_by["code"] - 120) <= 25


def test_mixture_sample_drops_unlisted_and_validates(spark):
    from logrange_spark.ops import sampling

    df = spark.createDataFrame(
        [(1, "web"), (2, "spam"), (3, "web")], "doc_id long, domain string"
    )
    out = sampling.mixture_sample(df, "doc_id", "domain", {"web": 1.0}, total=2)
    assert {r["domain"] for r in out.collect()} == {"web"}
    with pytest.raises(ValueError):
        sampling.mixture_sample(df, "doc_id", "domain", {})
    with pytest.raises(ValueError):
        sampling.mixture_sample(df, "doc_id", "domain", {"web": -1.0})
    with pytest.raises(ValueError):
        sampling.mixture_sample(df, "doc_id", "domain", {"web": 1.0}, total=0)
    # counts= skips the count job and gives identical output
    a = sampling.mixture_sample(
        df, "doc_id", "domain", {"web": 1.0}, total=4,
        counts={"web": 2, "spam": 1},
    ).collect()
    b = sampling.mixture_sample(
        df, "doc_id", "domain", {"web": 1.0}, total=4
    ).collect()
    key = lambda r: (r["doc_id"], r["copy"])  # noqa: E731
    assert sorted(map(key, a)) == sorted(map(key, b))


# ------------------------------------------------------ unigram LM scoring
def test_unigram_lm_score_matches_reference(spark):
    import math
    from collections import Counter

    rows = [
        (1, "the cat sat on the mat"),
        (2, "the dog sat on the rug"),
        (3, "zq xv qq zz vx"),  # gibberish: every token is rare
        (4, "the the the the the the"),  # degenerate: most common token
        (5, ""),  # empty → null score
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["avg_logprob"], r["ppl"])
        for r in text.unigram_lm_score(df, "doc_id", "text").collect()
    }
    # python twin (vocab_size large enough that nothing is OOV)
    alpha = 0.5
    toks = {i: t.lower().split() for i, t in rows}
    counts = Counter(w for ws in toks.values() for w in ws)
    total, v = sum(counts.values()), len(counts)
    denom = total + alpha * (v + 1)
    lp = {w: math.log((c + alpha) / denom) for w, c in counts.items()}
    for i, ws in toks.items():
        if not ws:
            assert got[i] == (0, None, None)
            continue
        avg = round(sum(lp[w] for w in ws) / len(ws), 6)
        assert got[i][0] == len(ws)
        assert abs(got[i][1] - avg) < 1e-6, (i, got[i], avg)
        assert abs(got[i][2] - round(math.exp(-avg), 4)) < 1e-3
    # the quality ordering the signal exists for
    assert got[3][1] < got[1][1] < got[4][1]


def test_unigram_lm_score_vocab_cut_and_external(spark):
    df = spark.createDataFrame(
        [(1, "a a a a b b b c c rare1"), (2, "a b c rare2 rare3")],
        "doc_id long, text string",
    )
    # vocab_size=3 keeps a/b/c; rare* fall to the OOV mass and must score
    # strictly below every in-vocab token
    out = {
        r["doc_id"]: r["avg_logprob"]
        for r in text.unigram_lm_score(df, "doc_id", "text", vocab_size=3).collect()
    }
    assert out[2] < out[1]
    # external vocab without _oov: unknowns take the vocab's min logp
    import math

    vocab = spark.createDataFrame(
        [("a", math.log(0.5)), ("b", math.log(0.25))], "token string, logp double"
    )
    ext = {
        r["doc_id"]: r["avg_logprob"]
        for r in text.unigram_lm_score(df, "doc_id", "text", vocab=vocab).collect()
    }
    # doc1: 4*log.5 + 3*log.25 + 3*log.25 (c,rare1 → min=log.25) over 10
    exp1 = round((4 * math.log(0.5) + 6 * math.log(0.25)) / 10, 6)
    assert abs(ext[1] - exp1) < 1e-6


def test_keep_passthrough_rides_existing_joins(spark):
    """r16: contamination() and unigram_lm_score() carry extra input
    columns through (``keep=``, the redact convention) so a pipeline
    tail reads attributes off the per-doc frame the op already builds
    instead of joining back. Contract: the op's own columns are
    identical to the ``keep=()`` call, the kept values equal a
    join-back against the input, and every input row appears exactly
    once (the attach frames are keyed 1:1 on the id)."""
    rows = [
        ("alpha beta gamma delta epsilon zeta eta theta iota kappa", 1),
        ("alpha beta gamma delta epsilon zeta eta theta iota kappa", 2),
        ("one two three", 3),  # shorter than n=8 → 0 grams
        ("", 4),  # empty → null LM score
    ]
    df = spark.createDataFrame(
        [(i, t, f"s{i}", i % 3) for t, i in rows],
        "doc_id long, text string, tag string, n_emails int",
    )
    bench = df.where(F.col("doc_id") == 1)
    want = {r["doc_id"]: (r["tag"], r["n_emails"]) for r in df.collect()}

    base = text.contamination(df, bench, n=8)
    kept = text.contamination(df, bench, n=8, keep=("tag", "n_emails"))
    assert kept.columns == [
        "doc_id", "tag", "n_emails",
        "n_grams", "n_contaminated", "contamination",
    ]
    own = ("doc_id", "n_grams", "n_contaminated", "contamination")
    k_rows = kept.collect()
    assert sorted(tuple(r[c] for c in own) for r in base.collect()) \
        == sorted(tuple(r[c] for c in own) for r in k_rows)
    assert sorted(r["doc_id"] for r in k_rows) == [1, 2, 3, 4]
    assert all((r["tag"], r["n_emails"]) == want[r["doc_id"]] for r in k_rows)

    base = text.unigram_lm_score(df, "doc_id", "text")
    kept = text.unigram_lm_score(df, "doc_id", "text", keep=("tag",))
    assert kept.columns == ["doc_id", "tag", "n_tokens", "avg_logprob", "ppl"]
    own = ("doc_id", "n_tokens", "avg_logprob", "ppl")
    k_rows = kept.collect()
    assert sorted(tuple(r[c] for c in own) for r in base.collect()) \
        == sorted(tuple(r[c] for c in own) for r in k_rows)
    assert sorted(r["doc_id"] for r in k_rows) == [1, 2, 3, 4]
    assert all(r["tag"] == want[r["doc_id"]][0] for r in k_rows)


# --------------------------------------------------------- document chunking
def _chunk_reference(text, max_tokens, overlap):
    ws = text.lower().split()
    if not ws:
        return []
    stride = max_tokens - overlap
    out = []
    for k, start in enumerate(range(0, len(ws), stride)):
        if start > 0 and start + overlap >= len(ws):
            break  # previous window already ended at start+overlap ≥ n:
            # this window would contain no new tokens
        piece = ws[start : start + max_tokens]
        out.append((k, len(piece), " ".join(piece)))
    return out


def test_chunk_documents_matches_reference(spark):
    from logrange_spark.ops import sampling

    texts = [
        (1, " ".join(f"t{i}" for i in range(25))),
        (2, " ".join(f"u{i}" for i in range(8))),   # exactly one window
        (3, "a b"),                                  # shorter than overlap
        (4, ""),                                     # no tokens → no chunks
        (5, " ".join(f"v{i}" for i in range(16))),  # boundary: n = 2*stride
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    for max_tokens, overlap in ((8, 0), (8, 3), (10, 9), (25, 0)):
        got = sorted(
            (r["doc_id"], r["chunk_id"], r["n_tokens"], r["text"])
            for r in sampling.chunk_documents(
                df, max_tokens, overlap=overlap
            ).collect()
        )
        want = sorted(
            (i, k, n, t)
            for i, txt in texts
            for k, n, t in _chunk_reference(txt, max_tokens, overlap)
        )
        assert got == want, (max_tokens, overlap)


def test_chunk_documents_roundtrip_and_validation(spark):
    from logrange_spark.ops import sampling

    df = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(100)))], "doc_id long, text string"
    )
    # non-overlapping chunks reassemble to the original token stream
    rows = sorted(
        (r["chunk_id"], r["text"])
        for r in sampling.chunk_documents(df, 7, overlap=0).collect()
    )
    joined = " ".join(t for _, t in rows).split()
    assert joined == [f"w{i}" for i in range(100)]
    assert all(len(t.split()) <= 7 for _, t in rows)
    with pytest.raises(ValueError):
        sampling.chunk_documents(df, 0)
    with pytest.raises(ValueError):
        sampling.chunk_documents(df, 5, overlap=5)


# ----------------------------------------------------------------- BM25
def test_bm25_search_matches_reference(spark):
    import math
    from collections import Counter

    rows = [
        (1, "spark shuffles data between executors during wide stages"),
        (2, "spark spark spark tuning spark partitions"),
        (3, "the cat sat on the mat and ignored the dog"),
        (4, "wide transformations in spark cause shuffles of data"),
        (5, "a very long document about gardens " + "filler " * 50),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    query, k1, b = "Spark shuffles", 1.2, 0.75
    got = [
        (r["doc_id"], r["score"])
        for r in text.bm25_search(df, query, k=5, k1=k1, b=b).collect()
    ]
    # python twin
    toks = {i: t.lower().split() for i, t in rows}
    n = len(rows)
    avgdl = sum(len(w) for w in toks.values()) / n
    terms = sorted(set(query.lower().split()))
    dfreq = {t: sum(1 for w in toks.values() if t in w) for t in terms}
    want = {}
    for i, ws in toks.items():
        tf = Counter(ws)
        s = 0.0
        for t in terms:
            if not tf[t]:
                continue
            idf = math.log(1 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            s += idf * tf[t] * (k1 + 1) / (
                tf[t] + k1 * (1 - b + b * len(ws) / avgdl)
            )
        if s:
            want[i] = round(s, 6)
    expect = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))
    assert [(i, pytest.approx(s, abs=2e-6)) for i, s in expect] == got
    # the doc matching BOTH terms must outrank the term-spam doc
    order = [i for i, _ in got]
    assert order.index(1) < order.index(2) and order.index(4) < order.index(2)
    assert 3 not in order and 5 not in order  # no query term → no score


def test_bm25_search_validates_and_topk(spark):
    df = spark.createDataFrame(
        [(i, f"common word doc{i}") for i in range(20)], "doc_id long, text string"
    )
    with pytest.raises(ValueError):
        text.bm25_search(df, "   ")
    out = text.bm25_search(df, "common", k=7).collect()
    assert len(out) == 7
    # deterministic tie-break by id (all docs tie on 'common')
    assert [r["doc_id"] for r in out] == list(range(7))


def test_near_duplicate_drops_transitive_hub(spark):
    """Hub cluster where direct-pair and transitive drop sets DIFFER:
    B(3) is similar to both A(1) and C(2), A and C are not similar. The
    direct rule keeps A and C (C has no smaller direct neighbor); the
    transitive rule keeps only the cluster minimum A."""
    base = [f"tok{i}" for i in range(20)]
    a = base
    c = ["alt0", "alt1", "alt2", "alt3", "alt4", "alt5"] + base[6:]
    hub = ["alt0", "alt1", "alt2"] + base[3:]  # 17 shared with each
    df = spark.createDataFrame(
        [(1, " ".join(a)), (2, " ".join(c)), (3, " ".join(hub)),
         (4, "entirely unrelated content about other things")],
        "doc_id long, text string",
    )
    j = {
        (r["id_a"], r["id_b"])
        for r in dedup.near_duplicates(df, "doc_id", "text", 0.7).collect()
    }
    assert (1, 3) in j and (2, 3) in j and (1, 2) not in j, j
    direct = {
        r[0] for r in dedup.near_duplicate_drops(df, "doc_id", "text", 0.7).collect()
    }
    trans = {
        r[0]
        for r in dedup.near_duplicate_drops(
            df, "doc_id", "text", 0.7, transitive=True
        ).collect()
    }
    assert direct == {3}
    assert trans == {2, 3}


# ---------------------------------------------------------------- tf-idf
def test_tfidf_keywords_matches_reference(spark):
    import math
    from collections import Counter

    rows = [
        (1, "apples and oranges and apples again"),
        (2, "oranges are orange and apples are red"),
        (3, "a treatise on gradient descent and apples"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r["doc_id"], r["token"], r["score"], r["rank"])
        for r in text.tfidf_keywords(df, m=3).collect()
    )
    toks = {i: t.lower().split() for i, t in rows}
    n = sum(1 for w in toks.values())
    dfreq = Counter(t for ws in toks.values() for t in set(ws))
    want = []
    for i, ws in toks.items():
        if not ws:
            continue
        tf = Counter(ws)
        scores = sorted(
            (
                round((c / len(ws)) * (math.log((n + 1) / (dfreq[t] + 1)) + 1), 6),
                t,
            )
            for t, c in tf.items()
        )
        scores = sorted(scores, key=lambda st: (-st[0], st[1]))[:3]
        want.extend((i, t, s, r + 1) for r, (s, t) in enumerate(scores))
    assert got == sorted(want)
    # corpus-common glue ('and', 'apples': df=3) never tops doc 3; its
    # df=1 terms all tie and the lexicographic tie-break is deterministic
    top1 = {i: t for i, t, s, r in got if r == 1}
    assert top1[3] == "a"
    assert {t for i, t, s, r in got if i == 3} & {"and", "apples"} == set()
    with pytest.raises(ValueError):
        text.tfidf_keywords(df, m=0)


# ------------------------------------------------- perceptual image hashing
def _grad_bmp(w, h, reverse=False, bump=None):
    """Smooth horizontal gradient BMP; optional brightness bump square."""
    import numpy as np

    from logrange_spark.ops.multimodal import encode_bmp24

    x = np.linspace(30, 220, w, dtype=np.float64)
    arr = np.repeat(x[None, :], h, axis=0)
    if reverse:
        arr = arr[:, ::-1]
    img = np.stack([arr, arr, arr], axis=-1).astype(np.uint8)
    if bump:
        r, c, s = bump
        img[r : r + s, c : c + s] = np.minimum(
            img[r : r + s, c : c + s].astype(int) + 90, 255
        ).astype(np.uint8)
    return encode_bmp24(img)


def test_dhash64_reference_8x9(spark):
    """On an exactly 8x9 image the box-average grid IS the luma plane, so
    the expected hash is computable by an independent path."""
    import numpy as np

    from logrange_spark.ops import multimodal as mm

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(8, 9, 3), dtype=np.uint8)
    payload = mm.encode_bmp24(img)
    got = mm.dhash64(payload)
    # independent expectation: BMP stores BGR, decode_pixels flips to RGB
    f = img[..., ::-1].astype(np.float64)
    luma = 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
    want = 0
    i = 0
    for r in range(8):
        for c in range(8):
            if luma[r, c] > luma[r, c + 1]:
                want |= 1 << i
            i += 1
    want = want - (1 << 64) if want >= (1 << 63) else want
    assert got == want
    assert mm.dhash64(payload) == got  # deterministic
    assert mm.dhash64(b"not an image") is None


def test_image_near_duplicates(spark):
    from logrange_spark.ops import multimodal as mm

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    base = _grad_bmp(60, 40)
    near = _grad_bmp(60, 40, bump=(4, 10, 6))   # small local edit
    far = _grad_bmp(60, 40, reverse=True)       # reversed gradient
    h_base, h_near, h_far = (mm.dhash64(p) for p in (base, near, far))
    assert 0 < ham(h_base, h_near) <= 6
    assert ham(h_base, h_far) > 40
    rows = [
        (1, bytearray(base)),
        (2, bytearray(near)),
        (3, bytearray(far)),
        (4, bytearray(b"junk payload")),        # undecodable → excluded
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in mm.image_near_duplicates(df, max_hamming=6).collect()
    }
    assert pairs == {(1, 2): ham(h_base, h_near)}


def test_hamming_near_pairs_brute_force(spark):
    import itertools
    import random

    rng = random.Random(3)
    vals = [rng.getrandbits(64) for _ in range(80)]
    vals += [vals[0] ^ 0b1011, vals[1] ^ (1 << 63), vals[2]]  # ham 3, 1, 0
    rows = [
        (i, v - (1 << 64) if v >= (1 << 63) else v) for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "vid long, h long")
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dedup.hamming_near_pairs(df, "vid", "h", 64, 4).collect()
    }
    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    want = {}
    for (i, a), (j, b) in itertools.combinations(enumerate(vals), 2):
        if ham(a, b) <= 4:
            want[(i, j)] = ham(a, b)
    assert got == want
    with pytest.raises(ValueError):
        dedup.hamming_near_pairs(df, "vid", "h", 65, 4)
    with pytest.raises(ValueError):
        dedup.hamming_near_pairs(df, "vid", "h", 64, 64)


def test_hamming_near_pairs_low_bits_ignores_high(spark):
    """bits < 64: distance is over the LOW bits only — stray high bits
    must neither inflate the residual nor break the pigeonhole recall
    guarantee (driver ADVICE r7: the residual used the full 64-bit XOR).
    Verified against a 32-bit brute force with randomized high garbage."""
    import itertools
    import random

    rng = random.Random(7)
    vals = [rng.getrandbits(32) for _ in range(60)]
    vals += [vals[0] ^ 0b101, vals[1], vals[2] ^ (1 << 31)]  # low-ham 2, 0, 1
    # pollute high 32 bits arbitrarily (incl. the sign bit)
    full = [(v | (rng.getrandbits(32) << 32)) for v in vals]
    rows = [
        (i, v - (1 << 64) if v >= (1 << 63) else v) for i, v in enumerate(full)
    ]
    df = spark.createDataFrame(rows, "vid long, h long")
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dedup.hamming_near_pairs(df, "vid", "h", 32, 3).collect()
    }
    want = {}
    for (i, a), (j, b) in itertools.combinations(enumerate(vals), 2):
        d = bin((a ^ b) & 0xFFFFFFFF).count("1")
        if d <= 3:
            want[(i, j)] = d
    assert got == want


def test_audio_near_duplicates(spark):
    import struct

    import numpy as np

    from logrange_spark.ops import multimodal as mm

    def wav(samples):
        data = (np.clip(samples, -1, 1) * 32767).astype("<i2").tobytes()
        fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, 8000, 16000, 2, 16)
        body = b"WAVE" + fmt + b"data" + struct.pack("<I", len(data)) + data
        return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE"[:0] + body

    rng = np.random.default_rng(9)
    t = np.arange(8000) / 8000.0
    envelope = 0.2 + 0.8 * np.abs(np.sin(2 * np.pi * 3 * t))  # energy shape
    base = envelope * np.sin(2 * np.pi * 440 * t)
    quiet = 0.4 * base                       # volume-scaled → same shape
    noisy = base + rng.normal(0, 0.01, base.shape)  # tiny noise
    other = (0.2 + 0.8 * np.abs(np.cos(2 * np.pi * 7 * t))) * np.sin(
        2 * np.pi * 440 * t
    )
    h = {k: mm.audio_fingerprint64(wav(v)) for k, v in
         [("base", base), ("quiet", quiet), ("noisy", noisy), ("other", other)]}
    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert h["base"] == h["quiet"]           # volume invariance: exact
    assert ham(h["base"], h["noisy"]) <= 6
    assert ham(h["base"], h["other"]) > 12
    assert mm.audio_fingerprint64(b"not audio") is None
    df = spark.createDataFrame(
        [(1, bytearray(wav(base))), (2, bytearray(wav(quiet))),
         (3, bytearray(wav(noisy))), (4, bytearray(wav(other))),
         (5, bytearray(b"junk"))],
        "media_id long, payload binary",
    )
    pairs = {
        (r["id_a"], r["id_b"])
        for r in mm.audio_near_duplicates(df, max_hamming=6).collect()
    }
    assert {(1, 2), (1, 3), (2, 3)} <= pairs and not any(4 in p or 5 in p for p in pairs)


# ------------------------------------------------- substring-level dedup
def _spans_reference(docs, L):
    """Python twin of repeated_spans/remove_repeated_spans: returns
    ({id: [(start, length), ...]}, {id: (kept_text, n_tokens, n_removed)})."""
    toks = {i: [t for t in txt.lower().split() if t] for i, txt in docs}
    occ = {}
    for i in sorted(toks):
        w = toks[i]
        for p in range(1, len(w) - L + 2):
            occ.setdefault(" ".join(w[p - 1 : p - 1 + L]), []).append((i, p))
    dup = sorted(o for lst in occ.values() if len(lst) >= 2 for o in lst[1:])
    spans = {}
    for i, p in dup:
        cur = spans.setdefault(i, [])
        if cur and p - cur[-1][1] <= L:
            cur[-1] = (cur[-1][0], p)
        else:
            cur.append((p, p))
    spans = {
        i: [(s, e + L - s) for s, e in v] for i, v in spans.items()
    }
    removed = {}
    for i in toks:
        w = toks[i]
        cov = set()
        for s, ln in spans.get(i, []):
            cov.update(range(s, s + ln))
        kept = [t for j, t in enumerate(w, 1) if j not in cov]
        removed[i] = (" ".join(kept), len(w), len(w) - len(kept))
    return spans, removed


def test_repeated_spans_planted_fixture(spark):
    """A 25-token boilerplate span planted into docs 3, 7 and 9 (distinct
    positions, distinct surrounding text): the first occurrence (doc 3)
    is kept, the later two are reported and removed."""
    import random

    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(500)]
    span = " ".join(f"boiler{i}" for i in range(25))

    def doc(n):
        return " ".join(rng.choice(vocab) for _ in range(n))

    rows = []
    for i in range(12):
        if i == 3:
            t = doc(10) + " " + span + " " + doc(30)
        elif i == 7:
            t = span + " " + doc(40)
        elif i == 9:
            t = doc(55) + " " + span
        else:
            t = doc(60)
        rows.append((i, t))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_id"], r["start"], r["length"])
        for r in dedup.repeated_spans(df, min_len=20).collect()
    }
    # doc 3 (first occurrence) reports nothing; 7 and 9 report the span.
    # The maximal covered interval of a 25-token repeat with L=20 is the
    # full 25 tokens (windows at pos..pos+5 all duplicate)
    assert got == {(7, 1, 25), (9, 56, 25)}, got
    out = {
        r["doc_id"]: (r["text"], r["n_tokens"], r["n_removed"])
        for r in dedup.remove_repeated_spans(df, min_len=20).collect()
    }
    assert out[7][2] == 25 and out[9][2] == 25 and out[3][2] == 0
    assert "boiler0" in out[3][0] and "boiler0" not in out[7][0]
    assert "boiler0" not in out[9][0]
    # survivors keep their non-span text intact
    assert out[7][1] == 65 and len(out[7][0].split()) == 40


def test_repeated_spans_matches_reference(spark):
    """Differential vs the python twin on a corpus with within-doc
    repeats, multi-doc repeats, overlapping plants and short docs."""
    import random

    rng = random.Random(4)
    vocab = [f"t{i}" for i in range(40)]  # small vocab → natural repeats
    rows = []
    for i in range(30):
        n = rng.randrange(0, 50)
        rows.append((i, " ".join(rng.choice(vocab) for _ in range(n))))
    # a within-document repeat (same span twice in one doc)
    rep = " ".join(f"x{i}" for i in range(8))
    rows.append((30, rep + " " + " ".join(rng.choice(vocab) for _ in range(5)) + " " + rep))
    # overlapping repeats across docs
    rows.append((31, " ".join(f"y{i}" for i in range(14))))
    rows.append((32, " ".join(f"y{i}" for i in range(2, 16))))
    L = 6
    df = spark.createDataFrame(rows, "doc_id long, text string")
    ref_spans, ref_removed = _spans_reference(rows, L)
    got_spans = {}
    for r in dedup.repeated_spans(df, min_len=L).collect():
        got_spans.setdefault(r["doc_id"], []).append((r["start"], r["length"]))
    assert {i: sorted(v) for i, v in got_spans.items()} == {
        i: sorted(v) for i, v in ref_spans.items()
    }
    got_removed = {
        r["doc_id"]: (r["text"], r["n_tokens"], r["n_removed"])
        for r in dedup.remove_repeated_spans(df, min_len=L).collect()
    }
    assert got_removed == ref_removed
    with pytest.raises(ValueError):
        dedup.repeated_spans(df, min_len=1)


def test_simhash16_histogram_count_equals_operator(spark):
    """The sf1 sweep reports the saturated 16-bit x100 output via the
    65,536-bin fingerprint-histogram convolution instead of running the
    pair join (SCALE.md). Pin that math: on a corpus where the join IS
    feasible, the convolution must equal simhash_near_pairs.count()."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from sf1_sweep import simhash16_exact_pairs

    rows = [
        (i, f"w{i % 7} common token stream {'x' * (i % 3)} t{i % 11}")
        for i in range(120)
    ] + [(200 + i, "dup dup dup identical") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    want = dedup.simhash_near_pairs(
        df, "doc_id", "text", max_hamming=3, bits=16
    ).count()
    got = simhash16_exact_pairs(spark, df)["out_rows_exact"]
    assert got == want and want > 0


def test_repeated_spans_never_broadcasts(spark):
    """Regression for the x100 sweep OOM (SCALE.md sf1 section): the
    one-row-per-duplicated-hash frame and the per-doc interval frame are
    DATA-SCALED, so their joins must stay sort-merge — Catalyst's
    post-aggregate size estimate undershoots and an unhinted plan
    broadcast them, dying with 'Could not allocate memory to grow
    BytesToBytesMap' at 500k docs / 28M windows."""
    df = spark.createDataFrame(
        [(i, "alpha beta gamma delta " * 20) for i in range(8)],
        "doc_id long, text string",
    )
    for op in (dedup.repeated_spans, dedup.remove_repeated_spans):
        plan = (
            op(df, "doc_id", "text")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "SortMergeJoin" in plan, op.__name__
        assert "BroadcastHashJoin" not in plan, op.__name__


# ----------------------------------------------------- MJPEG-in-MP4 frames
def _mp4_mjpeg(frames_jpeg, two_chunks=False):
    """Minimal ISO-BMFF container holding JPEG samples in an mdat, with
    real stsd('jpeg')/stsz/stsc/stco sample tables — the structure any
    demuxer reads. two_chunks=True splits samples across two chunks to
    exercise the stsc run expansion."""
    import struct

    def box(typ, payload):
        return struct.pack(">I", 8 + len(payload)) + typ + payload

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isommp41")
    mdat_payload = b"".join(frames_jpeg)
    # mdat starts right after ftyp; samples at known offsets inside it
    mdat_off = len(ftyp) + 8
    offs, cur = [], mdat_off
    for f in frames_jpeg:
        offs.append(cur)
        cur += len(f)
    mdat = box(b"mdat", mdat_payload)

    n = len(frames_jpeg)
    stsd = box(
        b"stsd",
        struct.pack(">II", 0, 1)
        + box(b"jpeg", b"\0" * 6 + struct.pack(">H", 1) + b"\0" * 70),
    )
    stsz = box(b"stsz", struct.pack(">III", 0, 0, n)
               + b"".join(struct.pack(">I", len(f)) for f in frames_jpeg))
    if two_chunks and n >= 3:
        # chunk 1: first 2 samples; chunk 2: the rest
        stco = box(b"stco", struct.pack(">II", 0, 2)
                   + struct.pack(">II", offs[0], offs[2]))
        stsc = box(b"stsc", struct.pack(">I", 0) + struct.pack(">I", 2)
                   + struct.pack(">III", 1, 2, 1)
                   + struct.pack(">III", 2, n - 2, 1))
    else:
        stco = box(b"stco", struct.pack(">II", 0, 1) + struct.pack(">I", offs[0]))
        stsc = box(b"stsc", struct.pack(">I", 0) + struct.pack(">I", 1)
                   + struct.pack(">III", 1, n, 1))
    stbl = box(b"stbl", stsd + stsz + stsc + stco)
    minf = box(b"minf", stbl)
    mdia = box(b"mdia", minf)
    trak = box(b"trak", mdia)
    mvhd = box(b"mvhd", b"\0" * 12 + struct.pack(">II", 1000, n * 40) + b"\0" * 80)
    moov = box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def test_mjpeg_mp4_frame_decode(spark):
    """frame_sample(real_codec=True) routes MJPEG-in-MP4 through the real
    JPEG decoder: synthesized container → numpy-verified frames (lossless
    at quant=1 on smooth data), multi-chunk sample tables handled, AVC-
    less containers fall back to the stub without raising."""
    import numpy as np

    from logrange_spark.ops import jpeg
    from logrange_spark.ops import multimodal as mm
    from logrange_spark.ops import png

    rng = np.random.default_rng(2)
    # smooth gradient frames (DCT-exact at quant=1 after level shift)
    frames = []
    for k in range(4):
        y, x = np.mgrid[0:16, 0:16]
        arr = np.stack([(x * 8 + k * 3) % 256, (y * 8) % 256,
                        ((x + y) * 4) % 256], axis=-1).astype(np.uint8)
        frames.append(arr)
    payload = _mp4_mjpeg([jpeg.encode_jpeg(f, quant=1) for f in frames],
                         two_chunks=True)
    # direct decode: every frame recovered exactly
    got = mm.decode_mjpeg_frames(payload, max_frames=8)
    assert got is not None and len(got) == 4
    for a, b in zip(got, frames):
        assert a.shape == b.shape and np.abs(a.astype(int) - b.astype(int)).max() <= 1
    # max_frames cap respected
    assert len(mm.decode_mjpeg_frames(payload, max_frames=2)) == 2
    # through the Spark operator: 1 row → 4 PNG frame rows
    df = spark.createDataFrame([(1, bytearray(payload))],
                               "media_id long, payload binary")
    rows = mm.frame_sample(df, real_codec=True).collect()
    assert [r["frame_idx"] for r in rows] == [0, 1, 2, 3]
    dec0 = png.decode_png(bytes(rows[0]["frame"]))
    assert dec0 is not None and np.abs(dec0.astype(int) - frames[0].astype(int)).max() <= 1
    # non-MJPEG mp4 (header-only synth from parse tests) falls back to stub
    assert mm.decode_mjpeg_frames(b"\x00" * 40) is None
    for cut in range(0, len(payload), 97):
        mm.decode_mjpeg_frames(payload[:cut])  # total on truncation


def test_embedding_near_duplicate_drops_equals_pair_path(spark):
    """O(n)-output embedding drop set == pairs→drop-id_b→distinct, on a
    corpus with a planted identical-vector cluster, jittered near-dups,
    novel vectors and a duplicated ZERO vector (whose null cosine keeps
    it out of both paths)."""
    import random

    rng = random.Random(13)
    base = [[rng.uniform(-1, 1) for _ in range(16)] for _ in range(25)]
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(base)]
    # identical cluster of 5 (ids 30..34) + a near-copy of base[0]
    boiler = [float(rng.uniform(-1, 1)) for _ in range(16)]
    rows += [(30 + j, boiler) for j in range(5)]
    rows.append((40, [float(x + rng.uniform(-0.005, 0.005)) for x in base[0]]))
    # duplicated zero vector: value-identical but cosine undefined
    rows += [(50, [0.0] * 16), (51, [0.0] * 16)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    pairs = ann.embedding_near_duplicates(df, threshold=0.98, n_rows=len(rows))
    want = {r["id_b"] for r in pairs.select("id_b").distinct().collect()}
    got = {
        r["vec_id"]
        for r in ann.embedding_near_duplicate_drops(
            df, threshold=0.98, n_rows=len(rows)
        ).collect()
    }
    assert got == want, (sorted(got ^ want))
    # the planted structure actually exercises both decomposition arms
    assert {31, 32, 33, 34} <= got  # non-rep identical members
    assert 40 in got or 0 in got  # verified cross pair drops the larger
    assert 50 not in got and 51 not in got  # zero vectors: null cosine


# ------------------------------------------------------ URL canonicalization
def _canon_url_ref(u):
    """Python twin of url.canonical_url (urllib-based)."""
    from urllib.parse import urlsplit

    from logrange_spark.ops import url as url_ops

    try:
        p = urlsplit(u)
    except ValueError:
        return None
    if not p.scheme or not p.hostname:
        return None
    scheme = p.scheme.lower()
    host = p.hostname.lower()
    if p.port is not None and not (
        (scheme == "http" and p.port == 80)
        or (scheme == "https" and p.port == 443)
    ):
        host = f"{host}:{p.port}"
    path = p.path or "/"
    if len(path) > 1 and path.endswith("/"):
        path = path[:-1]
    kept = sorted(
        q for q in p.query.split("&")
        if q
        and not q.split("=")[0].lower().startswith("utm_")
        and q.split("=")[0].lower() not in url_ops.TRACKING_PARAMS
    )
    qpart = "?" + "&".join(kept) if kept else ""
    return f"{scheme}://{host}{path}{qpart}"


def test_canonical_url_matches_reference(spark):
    """canonical_url merges scheme-case/default-port/fragment/tracking/
    param-order/trailing-slash variants; value-matches the urllib twin on
    every case; url_duplicates groups the variants."""
    from logrange_spark.ops import url as url_ops

    urls = [
        (1, "http://Example.com/a/b/"),
        (2, "http://example.com:80/a/b"),
        (3, "HTTP://EXAMPLE.COM/a/b#frag"),
        (4, "http://example.com/a/b?utm_source=x&utm_campaign=y"),
        (5, "http://example.com/a/b?z=1&a=2"),
        (6, "http://example.com/a/b?a=2&z=1&fbclid=abc"),
        (7, "https://example.com/a/b"),          # scheme differs: distinct
        (8, "http://example.com:8080/a/b"),      # non-default port: distinct
        (9, "https://example.com:443/"),
        (10, "https://example.com"),
        (11, "not a url"),
        (12, "mailto:user@example.com"),
        (13, "http://sub.Example.co.uk/X/Y?b=2&a=1&gclid=g"),
        (14, "http://example.com/a/b?UTM_Source=x&GCLID=g"),  # case-insensitive strip
    ]
    df = spark.createDataFrame(urls, "doc_id long, url string")
    got = {
        r["doc_id"]: r["c"]
        for r in df.select(
            "doc_id", url_ops.canonical_url(F.col("url")).alias("c")
        ).collect()
    }
    for i, u in urls:
        assert got[i] == _canon_url_ref(u), (i, u, got[i], _canon_url_ref(u))
    # the first three collapse; 4 joins them (tracking-only query); 5+6
    # merge on sorted params
    assert got[1] == got[2] == got[3] == got[4] == "http://example.com/a/b"
    assert got[14] == "http://example.com/a/b"
    assert got[5] == got[6] == "http://example.com/a/b?a=2&z=1"
    assert got[7] != got[1] and got[8] != got[1]
    assert got[9] == got[10] == "https://example.com/"
    assert got[11] is None and got[12] is None

    dups = {
        r["canonical_url"]: (r["keep_id"], r["dup_count"])
        for r in url_ops.url_duplicates(df, "doc_id", "url").collect()
    }
    assert dups["http://example.com/a/b"] == (1, 5)
    assert dups["http://example.com/a/b?a=2&z=1"] == (5, 2)
    assert dups["https://example.com/"] == (9, 2)


def _png_custom(arr16_or_8, ctype, depth, interlace):
    """Reference PNG encoder for the decoder's long-tail paths: any
    depth 8/16, optional Adam7 (filter 0 scanlines, spec pass order)."""
    import struct
    import zlib

    import numpy as np

    a = arr16_or_8
    h, w, c = a.shape
    sbytes = depth // 8
    passes = (
        [(0, 0, 1, 1)]
        if interlace == 0
        else [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
              (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]
    )
    raw = bytearray()
    dt = ">u2" if depth == 16 else "u1"
    for x0, y0, dx, dy in passes:
        sub = a[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        for y in range(sub.shape[0]):
            raw.append(0)
            raw += sub[y].astype(dt).tobytes()

    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace)
    return sig + chunk(b"IHDR", ihdr) + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b"")


def test_png_adam7_and_16bit(spark):
    """The former long-tail stubs now decode: Adam7-interlaced 8-bit RGB
    reconstructs pixel-exactly (odd dims exercise empty/partial passes),
    16-bit RGB scales via the high byte, and 16-bit Adam7 grayscale
    composes both paths."""
    import numpy as np

    from logrange_spark.ops import png

    rng = np.random.default_rng(8)
    # odd dimensions: several Adam7 passes are partial, one can be empty
    arr = rng.integers(0, 256, size=(11, 7, 3), dtype=np.uint8)
    dec = png.decode_png(_png_custom(arr, 2, 8, 1))
    assert dec is not None and (dec == arr).all()

    # tiny image where late passes dominate
    arr2 = rng.integers(0, 256, size=(2, 3, 3), dtype=np.uint8)
    dec2 = png.decode_png(_png_custom(arr2, 2, 8, 1))
    assert dec2 is not None and (dec2 == arr2).all()

    # 16-bit RGB: low bytes are junk, high bytes must survive
    hi = rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint16)
    a16 = (hi << 8) | rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint16)
    dec16 = png.decode_png(_png_custom(a16, 2, 16, 0))
    assert dec16 is not None and (dec16 == hi.astype(np.uint8)).all()

    # 16-bit + Adam7 grayscale → replicated to RGB
    g = rng.integers(0, 256, size=(9, 4, 1), dtype=np.uint16)
    g16 = (g << 8) | 0x7F
    decg = png.decode_png(_png_custom(g16, 0, 16, 1))
    assert decg is not None and (decg == np.repeat(g.astype(np.uint8), 3, axis=2)).all()

    # totality on truncation of an interlaced stream
    enc = _png_custom(arr, 2, 8, 1)
    for cut in range(0, len(enc), 13):
        png.decode_png(enc[:cut])  # must not raise
    # 16-bit palette stays rejected (spec: palette indices are 8-bit)
    bad = bytearray(_png_custom(arr, 2, 8, 0))
    assert png.decode_png(bytes(bad)) is not None


# -------------------------------------------------------- boilerplate lines
def test_boilerplate_lines_planted(spark):
    """A cookie banner planted into 6 of 10 docs (sometimes twice in one
    doc — counts once), a footer in 2, a rare line in 1: the banner and
    footer clear min_docs=2 / frac=0.15, the rare line does not; removal
    deletes EVERY occurrence and reports per-doc counts."""
    banner = "We use cookies to improve your experience"
    footer = "© 2024 Example Corp"
    rows = []
    for i in range(10):
        lines = [f"unique body {i} alpha", f"unique body {i} beta"]
        if i < 6:
            lines.insert(0, f"  {banner}  ")  # padded → trimmed match
        if i in (0, 3):
            lines.append(banner)  # within-doc repeat counts once
        if i in (4, 5):
            lines.append(footer)
        if i == 7:
            lines.append("rare line")
        lines.append("")  # trailing blank line never matches
        rows.append((i, "\n".join(lines)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    bp = {
        r["line"]: r["doc_count"]
        for r in text.boilerplate_lines(df, min_doc_frac=0.15).collect()
    }
    assert bp == {banner: 6, footer: 2}, bp
    out = {
        r["doc_id"]: (r["text"], r["n_lines"], r["n_removed"])
        for r in text.remove_boilerplate(df, min_doc_frac=0.15).collect()
    }
    assert out[0][2] == 2 and out[3][2] == 2  # both banner copies removed
    assert out[4][2] == 2 and out[5][2] == 2  # banner + footer
    assert out[7] == (f"unique body 7 alpha\nunique body 7 beta\nrare line", 3, 0)
    for i in range(10):
        assert banner not in out[i][0] and footer not in out[i][0]
    # n_docs passed by the caller skips the corpus count and must agree
    bp2 = {
        r["line"]: r["doc_count"]
        for r in text.boilerplate_lines(df, min_doc_frac=0.15, n_docs=10).collect()
    }
    assert bp2 == bp
    # max_lines cap is deterministic: top-1 by (doc_count desc, line asc)
    bp1 = text.boilerplate_lines(df, min_doc_frac=0.15, max_lines=1).collect()
    assert [(r["line"], r["doc_count"]) for r in bp1] == [(banner, 6)]
    with pytest.raises(ValueError):
        text.boilerplate_lines(df, min_doc_frac=1.5)


def test_boilerplate_matches_duckdb(spark):
    """Differential vs a DuckDB twin on a randomized corpus with planted
    template lines at several frequencies (both sides of the frac
    threshold) and messy whitespace."""
    import random

    import duckdb

    rng = random.Random(23)
    templates = [f"template line {t}" for t in range(8)]
    rows = []
    for i in range(40):
        lines = [f"body {i} {rng.randrange(1000)}"
                 for _ in range(rng.randrange(1, 5))]
        for t, tmpl in enumerate(templates):
            if rng.random() < (t + 1) / 10.0:
                lines.insert(rng.randrange(len(lines) + 1), f" {tmpl} ")
        if rng.random() < 0.3:
            lines.append("   ")  # whitespace-only line
        rows.append((i, "\n".join(lines)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    frac, mdocs = 0.1, 2
    got_bp = sorted(
        (r["line"], r["doc_count"])
        for r in text.boilerplate_lines(df, min_doc_frac=frac, min_docs=mdocs).collect()
    )
    got_rm = sorted(
        (r["doc_id"], r["text"], r["n_lines"], r["n_removed"])
        for r in text.remove_boilerplate(df, min_doc_frac=frac, min_docs=mdocs).collect()
    )
    con = duckdb.connect()
    con.register("docs", __import__("pandas").DataFrame(rows, columns=["doc_id", "text"]))
    bp_sql = f"""
      WITH dl AS (
        SELECT DISTINCT doc_id, trim(l) AS line
        FROM (SELECT doc_id, unnest(string_split(text, chr(10))) AS l FROM docs)
        WHERE trim(l) <> ''),
      freq AS (SELECT line, count(*) AS doc_count FROM dl GROUP BY line),
      tot AS (SELECT count(*) AS n FROM docs)
      SELECT line, doc_count FROM freq, tot
      WHERE doc_count >= {mdocs} AND doc_count >= n * {frac}
    """
    ref_bp = sorted((l, int(c)) for l, c in con.sql(bp_sql).fetchall())
    assert got_bp == ref_bp
    rm_sql = f"""
      WITH bp AS ({bp_sql}),
      bpl AS (SELECT coalesce(list(line), []) AS ls FROM bp),
      lined AS (SELECT doc_id,
                list_filter(list_transform(string_split(text, chr(10)), l -> trim(l)),
                            l -> l <> '') AS lines FROM docs)
      SELECT doc_id,
             array_to_string(list_filter(lines, l -> NOT list_contains(bpl.ls, l)), chr(10)) AS text,
             len(lines) AS n_lines,
             len(lines) - len(list_filter(lines, l -> NOT list_contains(bpl.ls, l))) AS n_removed
      FROM lined, bpl
    """
    ref_rm = sorted((int(d), t, int(n), int(r)) for d, t, n, r in con.sql(rm_sql).fetchall())
    assert got_rm == ref_rm


# ---------------------------------------------------------- semantic dedup
def _semdedup_reference(rows, cents, threshold):
    """Brute-force twin of semantic_dedup_drops: same centroid argmax
    (first max over cid-sorted centroids), same keep-order (csim asc,
    id asc), pairwise shadow rule, zero vectors exempt. Float folds
    reproduce the Spark expressions' left-to-right double arithmetic."""
    import math

    def dot(a, b):
        s = 0.0
        for x, y in zip(a, b):
            s += float(x) * float(y)
        return s

    def norm(a):
        return math.sqrt(dot(a, a))

    cs = sorted(cents)
    vec = dict(rows)
    assign = {}
    for i, v in rows:
        n = norm(v)
        if n == 0.0:
            continue
        scores = [dot(v, cv) / (n * norm(cv)) for _, cv in cs]
        best = max(scores)
        assign[i] = (cs[scores.index(best)][0], best)
    by_cid = {}
    for i, (cid, csim) in assign.items():
        by_cid.setdefault(cid, []).append(i)
    drops = set()
    for cid, ids in by_cid.items():
        order = sorted(ids, key=lambda i: (assign[i][1], i))
        for xi, x in enumerate(order):
            for y in order[:xi]:
                c = dot(vec[x], vec[y]) / (norm(vec[x]) * norm(vec[y]))
                if c >= threshold:
                    drops.add(x)
                    break
    return drops


SEM_CENTS = [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0]),
             (2, [0.0, 0.0, 1.0, 0.0])]


def test_semantic_dedup_planted(spark):
    """The keep rule is the paper's: within an ε-ball the LEAST centroid-
    similar member survives. a1 (off-axis) shadows a0 (dead-on the
    centroid); exact copies collapse to their representative; sub-ε
    pairs and zero vectors are untouched."""
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),     # csim 1.0 — most typical → dropped
        (1, [1.0, 0.25, 0.0, 0.0]),    # csim < 1, cos(0,1) ≈ .970 → kept
        (2, [1.0, 0.25, 0.0, 0.0]),    # exact copy of 1 → dropped
        (3, [0.0, 1.0, 0.0, 0.0]),     # cluster 1
        (4, [0.5, 1.0, 0.0, 0.0]),     # cos(3,4) ≈ .894 < ε → kept
        (5, [0.0, 0.0, 0.0, 0.0]),     # zero vector → exempt
        (6, [0.0, 0.0, 0.0, 0.0]),     # even as an exact copy
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r["vec_id"] for r in
           ann.semantic_dedup_drops(df, SEM_CENTS, threshold=0.95).collect()}
    assert got == {0, 2}, got
    assert got == _semdedup_reference(rows, SEM_CENTS, 0.95)


@pytest.mark.parametrize("assign", ["expr", "numpy"])
def test_semantic_dedup_matches_reference(spark, assign):
    """Differential vs the brute-force twin on a randomized corpus with
    planted scaled copies (cos = 1), noisy near-dups, exact-copy groups
    and cross-cluster borderline vectors; exercised at SKEW_CAP=2 so the
    grid-salted rewrite is also pinned against the twin. Runs under BOTH
    assignment modes — the vectors are dyadic rationals with exact float
    dots, so the numpy matmul path must match the expression path (and
    the twin) bit-exactly here."""
    import random

    rng = random.Random(17)
    cents = [(c, [rng.randrange(-8, 9) / 8.0 for _ in range(4)]) for c in range(4)]
    rows = []
    i = 0
    for _ in range(40):
        v = [rng.randrange(-32, 33) / 16.0 for _ in range(4)]
        rows.append((i, v)); i += 1
        r = rng.random()
        if r < 0.25:  # scaled copy — same direction, cosine exactly 1
            rows.append((i, [x * 2.0 for x in v])); i += 1
        elif r < 0.5:  # exact-copy group
            for _ in range(rng.randrange(1, 4)):
                rows.append((i, list(v))); i += 1
        elif r < 0.7:  # one-coordinate nudge (near-dup, maybe sub-ε)
            w = list(v); w[rng.randrange(4)] += 0.25
            rows.append((i, w)); i += 1
    rows.append((i, [0.0] * 4)); i += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    ref = _semdedup_reference(rows, cents, 0.9)
    got = {r["vec_id"] for r in
           ann.semantic_dedup_drops(df, cents, threshold=0.9,
                                    assign=assign).collect()}
    assert got == ref, (sorted(got - ref), sorted(ref - got))
    from logrange_spark.ops import dedup as _dd
    old = _dd.SKEW_CAP
    _dd.SKEW_CAP = 2
    try:
        salted = {r["vec_id"] for r in
                  ann.semantic_dedup_drops(df, cents, threshold=0.9,
                                           assign=assign).collect()}
    finally:
        _dd.SKEW_CAP = old
    assert salted == ref


def test_semantic_dedup_trained_centroids(spark):
    """End-to-end with MLlib-trained centroids on the real embeddings
    table plus planted exact copies: copies of existing vectors are
    dropped (keep-order ties break toward the original's smaller id),
    the result is deterministic, and originals-only rows survive."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    base = emb.limit(60).cache()
    cents = ann.ivf_train_centroids(base, n_centroids=4, max_iter=5)
    copies = base.limit(10).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    both = base.select("vec_id", "embedding").unionByName(copies)
    got = {r["vec_id"] for r in
           ann.semantic_dedup_drops(both, cents, threshold=0.99,
                                    ).collect()}
    planted = {r["vec_id"] + 100000 for r in base.limit(10).collect()}
    assert planted <= got  # every planted copy dropped
    again = {r["vec_id"] for r in
             ann.semantic_dedup_drops(both, cents, threshold=0.99).collect()}
    assert got == again


# -------------------------------------------------------- quality classifier
def _quality_corpus(rng, n, good):
    """Synthetic docs: 'good' docs draw from a small english-like
    phrasebook (stable bigrams), 'bad' docs are gibberish tokens."""
    phrases = ["the quick brown fox", "jumps over the lazy dog",
               "a stitch in time saves nine", "all that glitters is not gold"]
    out = []
    for i in range(n):
        if good:
            t = " ".join(rng.choice(phrases) for _ in range(rng.randrange(2, 5)))
        else:
            t = " ".join(
                "".join(rng.choice("zxqvkj") for _ in range(rng.randrange(3, 9)))
                for _ in range(rng.randrange(8, 20))
            )
        out.append((i, t))
    return out


def test_classifier_score_twin(spark):
    """The relational scorer equals a python mean-bag dot product +
    sigmoid under a hand-made weight table (Spark's murmur3 is read back
    once as an opaque term→feature oracle): exercises the explode /
    mean-normalize / broadcast-join / per-doc-sum path, the intercept
    feature, hash collisions folding into one feature, and empty docs."""
    import math

    docs = [
        (0, "the quick brown fox"),
        (1, "the the the"),            # repeated term → tf 3, mean 1.0
        (2, ""),                       # no terms → sigmoid(bias)
        (3, "  "),
        (4, "jumps over the lazy dog the quick"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    # term → feature mapping straight from the shared expression
    terms = sorted({t for _, x in docs for t in _py_terms(x)})
    tdf = spark.createDataFrame([(t,) for t in terms], "t string")
    fmap = {r["t"]: r["f"] for r in
            tdf.select("t", text.classifier_feature(F.col("t")).alias("f")).collect()}
    import random

    rng = random.Random(5)
    wmap = {f: rng.uniform(-2, 2) for f in set(fmap.values())}
    wmap[-1] = 0.7
    w = spark.createDataFrame(list(wmap.items()), "feature int, weight double")
    got = {r["doc_id"]: (r["n_terms"], r["score"])
           for r in text.quality_classifier_score(df, w).collect()}
    for did, txt in docs:
        ts = _py_terms(txt)
        feats = {}
        for t in ts:
            feats[fmap[t]] = feats.get(fmap[t], 0) + 1
        dot = sum(c / max(len(ts), 1) * wmap[f] for f, c in feats.items())
        want = 1.0 / (1.0 + math.exp(-(dot + wmap[-1])))
        n_terms, score = got[did]
        assert n_terms == len(ts)
        assert abs(score - want) < 2e-6, (did, score, want)


def _py_terms(txt, ngram=2):
    toks = [t for t in txt.lower().strip().split() if t]
    out = list(toks)
    for n in range(2, ngram + 1):
        out += [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]
    return out


def test_quality_classifier_separates(spark):
    """Held-out english-like docs outscore gibberish docs with a wide
    margin, and every weight row is a finite observed feature — the
    behavioral contract of the trained quality filter."""
    import math
    import random

    rng = random.Random(7)
    pos = spark.createDataFrame(_quality_corpus(rng, 30, True),
                                "doc_id long, text string")
    neg = spark.createDataFrame(_quality_corpus(rng, 30, False),
                                "doc_id long, text string")
    w = text.train_quality_classifier(pos, neg)
    rows = w.collect()
    assert all(math.isfinite(r["weight"]) for r in rows)
    assert sum(1 for r in rows if r["feature"] == -1) == 1
    held_pos = spark.createDataFrame(_quality_corpus(rng, 10, True),
                                     "doc_id long, text string")
    held_neg = spark.createDataFrame(_quality_corpus(rng, 10, False),
                                     "doc_id long, text string")
    ps = [r["score"] for r in text.quality_classifier_score(held_pos, w).collect()]
    ns = [r["score"] for r in text.quality_classifier_score(held_neg, w).collect()]
    assert min(ps) > 0.7 and max(ns) < 0.3, (min(ps), max(ns))


def test_classifier_training_twin(spark):
    """Two damped-Newton passes reproduced in numpy (feature indices read
    back once from the shared hash expression): weights match within
    float-reassociation noise. Pins the gradient/curvature aggregates,
    the mean-bag x values, the ±lr clamp and the bias-as-feature--1
    wiring — not just end-state behavior."""
    import math

    pos_rows = [(0, "good text here"), (1, "more good text")]
    neg_rows = [(0, "zz qq xx"), (1, "qq zz zz")]
    pos = spark.createDataFrame(pos_rows, "doc_id long, text string")
    neg = spark.createDataFrame(neg_rows, "doc_id long, text string")
    w = {r["feature"]: r["weight"]
         for r in text.train_quality_classifier(pos, neg, iters=2).collect()}
    # python twin
    all_terms = sorted({t for _, x in pos_rows + neg_rows for t in _py_terms(x)})
    tdf = spark.createDataFrame([(t,) for t in all_terms], "t string")
    fmap = {r["t"]: r["f"] for r in
            tdf.select("t", text.classifier_feature(F.col("t")).alias("f")).collect()}
    docs = [(x, 1.0) for _, x in pos_rows] + [(x, 0.0) for _, x in neg_rows]
    feats = []
    for txt, y in docs:
        ts = _py_terms(txt)
        fv = {}
        for t in ts:
            fv[fmap[t]] = fv.get(fmap[t], 0.0) + 1.0
        fv = {f: c / max(len(ts), 1) for f, c in fv.items()}
        fv[-1] = 1.0
        feats.append((fv, y))
    n = len(feats)
    lr, reg = 1.0, 1e-4
    ww = {}
    for _ in range(2):
        g, h = {}, {}
        for fv, y in feats:
            s = 1.0 / (1.0 + math.exp(-sum(x * ww.get(f, 0.0) for f, x in fv.items())))
            for f, x in fv.items():
                g[f] = g.get(f, 0.0) + x * (s - y) / n
                h[f] = h.get(f, 0.0) + x * x * s * (1.0 - s) / n
        for f in g:
            l2 = reg if f >= 0 else 0.0
            raw = (g[f] + l2 * ww.get(f, 0.0)) / (h[f] + l2 + 1e-8)
            ww[f] = ww.get(f, 0.0) - max(min(raw, lr), -lr)
    assert set(w) == set(ww)
    for f in ww:
        assert abs(w[f] - ww[f]) < 1e-9, (f, w[f], ww[f])


# ------------------------------------------------------------------ DSIR
def test_dsir_scores_twin(spark):
    """Numpy-free python twin of dsir_logratios + dsir_scores on tiny
    corpora: feature indices read back once from the shared hash
    expression, add-alpha LMs and per-doc tf·logratio sums recomputed in
    python — logw matches within float-reassociation noise. Pins the
    smoothing form (alpha per hashed bucket over the FULL feature
    space), the raw-tf weighting (not the classifier's mean bag), and
    the missing-feature coalesce."""
    import math

    from logrange_spark.ops import sampling

    target_rows = [(0, "good clean text"), (1, "clean text here")]
    raw_rows = [(10, "good clean text here"), (11, "zz qq junk junk"),
                (12, "clean zz"), (13, "")]
    target = spark.createDataFrame(target_rows, "doc_id long, text string")
    raw = spark.createDataFrame(raw_rows, "doc_id long, text string")
    nf, alpha = 1 << 18, 1.0
    ratios = sampling.dsir_logratios(target, raw, alpha=alpha)
    got = {r["doc_id"]: (r["n_terms"], r["logw"]) for r in
           sampling.dsir_scores(raw, ratios).collect()}
    # python twin
    all_terms = sorted({t for _, x in target_rows + raw_rows
                        for t in _py_terms(x)})
    tdf = spark.createDataFrame([(t,) for t in all_terms], "t string")
    fmap = {r["t"]: r["f"] for r in
            tdf.select("t", text.classifier_feature(F.col("t")).alias("f"))
            .collect()}

    def counts(rows):
        c = {}
        for _, x in rows:
            for t in _py_terms(x):
                c[fmap[t]] = c.get(fmap[t], 0) + 1
        return c

    tc, rc = counts(target_rows), counts(raw_rows)
    ct, cr = sum(tc.values()), sum(rc.values())
    b = nf * alpha

    def lr(f):
        return math.log((tc.get(f, 0) + alpha) / (ct + b)) - math.log(
            (rc.get(f, 0) + alpha) / (cr + b))

    for did, txt in raw_rows:
        ts = _py_terms(txt)
        want = sum(lr(fmap[t]) for t in ts)
        n_terms, logw = got[did]
        assert n_terms == len(ts)
        assert abs(logw - want) < 1e-9, (did, logw, want)
    assert got[13] == (0, 0.0)  # zero-term doc present, logw 0


def test_dsir_sample_selects_targetlike(spark):
    """Gumbel top-k resampling is deterministic, returns exactly k rows,
    and concentrates on documents resembling the target LM in the
    DSIR regime (target-like text RARE in the raw pool — here 5 of 100
    docs, all the same length so the weight gap is vocabulary, not
    length): target-term log-ratios sit ~1.1 nats above junk-term
    ratios, 13 terms/doc → ~14-nat weight gaps dwarfing the O(log n)
    Gumbel spread, so all 5 target-like docs must make the k=5 cut."""
    from logrange_spark.ops import sampling

    target = spark.createDataFrame(
        [(i, "the quick brown fox jumps over a lazy dog") for i in range(8)],
        "doc_id long, text string")
    rows = [(i, "quick brown fox over a lazy dog") for i in range(5)]
    rows += [(100 + i, f"zz{i} qq{i} xx{i} ww{i} vv{i} uu{i} tt{i}")
             for i in range(95)]
    raw = spark.createDataFrame(rows, "doc_id long, text string")
    got = sampling.dsir_sample(raw, target, k=5)
    picked = [r["doc_id"] for r in got.collect()]
    assert len(picked) == 5 and len(set(picked)) == 5
    assert all(d < 100 for d in picked), picked
    again = [r["doc_id"] for r in sampling.dsir_sample(raw, target, k=5).collect()]
    assert picked == again
    other = sampling.dsir_sample(raw, target, k=20, seed=7).collect()
    assert len(other) == 20 and len({r["doc_id"] for r in other}) == 20


# ------------------------------------------------------------- BPE train
def _py_bpe(word_counts, n_merges, min_pair_count=2):
    """Classic BPE twin (Sennrich et al. 2016): weighted adjacent-pair
    argmax over the word vocabulary, left-to-right greedy re-segment.
    Tie-break mirrors the Spark orderBy: count DESC, then (a, b) ASC."""
    vocab = {w: list(w) for w in word_counts}
    merges = []
    for _ in range(n_merges):
        pairs = {}
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + word_counts[w]
        if not pairs:
            break
        (a, b), n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < min_pair_count:
            break
        merges.append((a, b))
        for w, syms in vocab.items():
            out = []
            for x in syms:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            vocab[w] = out
    return merges, vocab


def test_bpe_train_twin(spark):
    """Merge schedule AND final vocabulary segmentations match the
    classic-BPE python twin on a randomized weighted corpus (word
    repetition supplies the weights); pins the weighted argmax, the
    deterministic tie-break and the left-to-right greedy fold incl.
    the overlapping-pair case ('aaaa')."""
    import random

    rng = random.Random(5)
    words = ["low", "lower", "lowest", "newer", "newest", "wider",
             "aaaa", "banana", "bandana"]
    rows, wc = [], {}
    for i in range(40):
        ws = rng.choices(words, k=rng.randrange(1, 6))
        for w in ws:
            wc[w] = wc.get(w, 0) + 1
        rows.append((i, " ".join(ws)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    merges, vocab = text.bpe_train(docs, n_merges=12)
    ref_merges, ref_vocab = _py_bpe(wc, 12)
    assert merges == ref_merges
    got_vocab = {r["w"]: (r["count"], list(r["symbols"]))
                 for r in vocab.collect()}
    assert got_vocab == {w: (wc[w], ref_vocab[w]) for w in wc}


def test_bpe_train_paths_equal_sequential(spark):
    """The in-memory driver path (incremental pair counts + lazy heap)
    and the distributed batched path (merges_per_round acceptance rule)
    both produce the EXACT sequential argmax schedule and final
    segmentations; batching and the driver path only change the Spark
    job count. Also pins the job-count claims: the driver path is one
    round total, and the batched spark path needs no more rounds than
    one-merge-per-round."""
    import random

    rng = random.Random(11)
    words = ["".join(rng.choices("abcdef", k=rng.randrange(2, 9)))
             for _ in range(50)]
    rows, wc = [], {}
    for i in range(70):
        ws = rng.choices(words, k=rng.randrange(1, 7))
        for w in ws:
            wc[w] = wc.get(w, 0) + 1
        rows.append((i, " ".join(ws)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    ref_merges, ref_vocab = _py_bpe(wc, 40)
    got = {}
    for name, kw in {
        "driver": dict(driver_vocab_rows=1_000_000),
        "spark_batched": dict(driver_vocab_rows=0, merges_per_round=16),
        "spark_seq": dict(driver_vocab_rows=0, merges_per_round=1),
    }.items():
        st = {}
        m, v = text.bpe_train(docs, n_merges=40, stats=st, **kw)
        assert m == ref_merges, name
        gv = {r["w"]: list(r["symbols"]) for r in v.collect()}
        assert gv == {w: ref_vocab[w] for w in wc}, name
        got[name] = st
    assert got["driver"] == {
        "rounds": 1, "merges": len(ref_merges), "path": "driver"}
    assert got["spark_batched"]["path"] == "spark"
    assert got["spark_batched"]["rounds"] <= got["spark_seq"]["rounds"]


def test_bpe_segment_oov_fallback(spark):
    """Segmentation joins the trained table in token order and falls
    back to character pieces for out-of-vocabulary words."""
    train = spark.createDataFrame(
        [(0, "low lower low lower lowest")], "doc_id long, text string")
    merges, vocab = text.bpe_train(train, n_merges=2)
    assert merges == [("l", "o"), ("lo", "w")]
    new = spark.createDataFrame(
        [(7, "lower unseen low")], "doc_id long, text string")
    [r] = text.bpe_segment(new, vocab).collect()
    assert r["pieces"][:3] == ["low", "e", "r"]
    assert r["pieces"][3:9] == ["u", "n", "s", "e", "e", "n"]
    assert r["pieces"][9:] == ["low"] and r["n_pieces"] == 10


# ------------------------------------------------------ Gopher doc rules
def test_gopher_quality_stats_twin(spark):
    """Every table-A1 signal matches a python twin on crafted +
    randomized docs, and the gate applies the published defaults."""
    import random
    import re

    def twin(txt):
        t = txt or ""
        w = [x for x in t.lower().strip().split() if x]
        lines = [x.strip() for x in t.split("\n") if x.strip()]
        nw, nl = len(w), len(lines)
        mean = sum(len(x) for x in w) / nw if nw else 0.0
        sym = t.count("#") + t.count("...") + t.count("…")
        bullet = sum(1 for x in lines
                     if any(x.startswith(b) for b in text.GOPHER_BULLETS))
        ell = sum(1 for x in lines if x.endswith("...") or x.endswith("…"))
        alpha = sum(1 for x in w if re.search("[a-z]", x))
        stops = len(set(w) & set(text.GOPHER_STOPWORDS))
        r6 = lambda v: round(v, 6)
        return (nw, r6(mean), r6(sym / nw if nw else 0.0),
                r6(bullet / nl if nl else 0.0), r6(ell / nl if nl else 0.0),
                r6(alpha / nw if nw else 0.0), stops)

    rng = random.Random(17)
    crafted = [
        "the quick brown foxes jumped over those lazy hounds with "
        "style and that was clearly fine to be honest",
        "• one\n• two\n• three\nplain line",
        "wait...\nmore…\nno dots here",
        "#### ## # lots of symbols # and more...",
        "123 456 789 000",
        "",
        None,
        "- bullet\n* star\n▪ square",
    ]
    words = ["the", "cat", "sat...", "#tag", "123", "•x", "be", "of"]
    rand = ["\n".join(" ".join(rng.choices(words, k=rng.randrange(1, 9)))
                      for _ in range(rng.randrange(1, 5)))
            for _ in range(40)]
    rows = [(i, t) for i, t in enumerate(crafted + rand)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_words"], r["mean_word_len"],
                         r["symbol_word_ratio"], r["bullet_line_frac"],
                         r["ellipsis_line_frac"], r["alpha_word_frac"],
                         r["stopword_hits"])
           for r in text.gopher_quality_stats(df).collect()}
    for did, txt in rows:
        assert got[did] == twin(txt), (did, txt, got[did], twin(txt))

    gated = {r["doc_id"]: r["gopher_pass"]
             for r in text.gopher_gate(text.gopher_quality_stats(df)).collect()}
    # crafted doc 0 fails only on word count (14 < 50); relax min_words
    assert gated[0] is False
    relaxed = {r["doc_id"]: r["gopher_pass"] for r in text.gopher_gate(
        text.gopher_quality_stats(df), min_words=5).collect()}
    assert relaxed[0] is True
    assert relaxed[4] is False  # all-numeric: alpha_word_frac = 0
    assert relaxed[5] is False and relaxed[6] is False  # empty/null


# ------------------------------------------------- CCNet stratification
def test_perplexity_buckets_twin(spark):
    """Per-group tercile bucketing matches a numpy twin (Spark's exact
    `percentile` and numpy's linear interpolation share the
    f*(n-1)-index definition); boundary rows go to the lower band."""
    import random

    import numpy as np

    rng = random.Random(3)
    rows = [(i, rng.choice(["en", "de"]), round(rng.uniform(1.0, 50.0), 3))
            for i in range(200)]
    rows.append((900, "en", rows[0][2]))  # duplicate ppl value
    df = spark.createDataFrame(rows, "doc_id long, lang_pred string, ppl double")
    got = {r["doc_id"]: r["bucket"]
           for r in text.perplexity_buckets(df).collect()}
    by_lang = {}
    for _, lang, p in rows:
        by_lang.setdefault(lang, []).append(p)
    want = {}
    for did, lang, p in rows:
        t1, t2 = np.percentile(by_lang[lang], [100 / 3, 200 / 3],
                               method="linear")
        want[did] = "head" if p <= t1 else ("middle" if p <= t2 else "tail")
    assert got == want
    # custom fraction count falls back to q{i} labels
    q = text.perplexity_buckets(df, fractions=(0.25, 0.5, 0.75))
    assert set(r["bucket"] for r in q.collect()) <= {"q0", "q1", "q2", "q3"}


def test_ccnet_pipeline_end_to_end(spark):
    """The composed CCNet tail: trained language ID -> per-language KN
    perplexity -> per-language terciles. Each language's buckets are
    balanced thirds ordered by perplexity, the None entry catches
    unmapped languages, and absent a default those documents drop."""
    en = "the quick brown fox jumps over the lazy dog"
    de = "der schnelle braune fuchs springt ueber den faulen hund"
    seed = spark.createDataFrame(
        [(i, "en", en) for i in range(10)]
        + [(100 + i, "de", de) for i in range(10)],
        "doc_id long, lang string, text string")
    w = text.train_lang_classifier(seed, iters=4)
    import random

    rng = random.Random(9)
    docs = []
    for i in range(30):
        words = en.split() if i % 2 == 0 else de.split()
        docs.append((i, " ".join(rng.choices(words, k=rng.randrange(3, 12)))))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    lm_en = text.kn_ngram_lm(seed.where(F.col("lang") == "en"), order=2)
    lm_de = text.kn_ngram_lm(seed.where(F.col("lang") == "de"), order=2)
    out = text.ccnet_pipeline(df, w, {"en": lm_en, "de": lm_de}).collect()
    assert len(out) == 30
    assert {r["lang_pred"] for r in out} == {"en", "de"}
    for lang in ("en", "de"):
        rows = sorted((r for r in out if r["lang_pred"] == lang),
                      key=lambda r: r["ppl"])
        n = len(rows)
        labels = [r["bucket"] for r in rows]
        # ordered by ppl, labels must be a head* middle* tail* run
        assert labels == sorted(labels, key=["head", "middle", "tail"].index)
        assert labels.count("head") >= n // 4
        assert labels.count("tail") >= n // 4
    # unmapped language: dropped without a default, kept with one
    only_en = text.ccnet_pipeline(df, w, {"en": lm_en}).collect()
    assert {r["lang_pred"] for r in only_en} == {"en"}
    with_def = text.ccnet_pipeline(df, w, {"en": lm_en, None: lm_de}).collect()
    assert len(with_def) == 30


def test_ccnet_pipeline_keyed_and_union_paths_agree(spark):
    """Branch-parity pin (round-13 ADVICE): the single-pass KEYED path
    (all model orders equal) and the per-language UNION path (mixed
    orders) must route the same inputs to the same models — including
    documents whose predicted language has NO model, which fall to the
    ``None`` default in BOTH branches. The union path is forced by
    adding a higher-order model for a language no document predicts."""
    en = "the quick brown fox jumps over the lazy dog"
    de = "der schnelle braune fuchs springt ueber den faulen hund"
    fr = "le renard brun rapide saute par dessus le chien paresseux"
    seed = spark.createDataFrame(
        [(i, "en", en) for i in range(8)]
        + [(100 + i, "de", de) for i in range(8)]
        + [(200 + i, "fr", fr) for i in range(8)],
        "doc_id long, lang string, text string")
    w = text.train_lang_classifier(seed, iters=4)
    import random

    rng = random.Random(31)
    docs = []
    for i in range(24):
        words = (en, de, fr)[i % 3].split()
        docs.append((i, " ".join(rng.choices(words, k=rng.randrange(3, 10)))))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    lm_en = text.kn_ngram_lm(seed.where(F.col("lang") == "en"), order=2)
    lm_de = text.kn_ngram_lm(seed.where(F.col("lang") == "de"), order=2)
    lm_def = text.kn_ngram_lm(seed, order=2)
    # keyed: one shared order; fr docs have no model → default
    keyed = {(r["doc_id"]): (r["lang_pred"], r["ppl"], r["bucket"])
             for r in text.ccnet_pipeline(
                 df, w, {"en": lm_en, "de": lm_de, None: lm_def}).collect()}
    # union: a THIRD order for a language nothing predicts flips the
    # len(orders)==1 branch; en/de/fr routing must be unchanged
    lm_unused = text.kn_ngram_lm(seed, order=3)
    union = {(r["doc_id"]): (r["lang_pred"], r["ppl"], r["bucket"])
             for r in text.ccnet_pipeline(
                 df, w, {"en": lm_en, "de": lm_de, "zz": lm_unused,
                         None: lm_def}).collect()}
    assert set(keyed) == set(union) == set(range(24))
    assert keyed == union
    assert {v[0] for v in keyed.values()} == {"en", "de", "fr"}


def test_kn_ngram_score_keyed_equals_per_model(spark):
    """The single-pass keyed scorer is row-for-row identical to running
    kn_ngram_score per model on the matching partition — same math,
    one corpus scan instead of k (the ccnet_pipeline 100 TB shape).
    Rows whose key names no model yield no output; mixed orders are
    rejected."""
    t1 = spark.createDataFrame(
        [("a b c a b",), ("b c d",)], "text string")
    t2 = spark.createDataFrame(
        [("x y z x",), ("y z z y x",)], "text string")
    m1 = text.kn_ngram_lm(t1, order=3)
    m2 = text.kn_ngram_lm(t2, order=3)
    docs = spark.createDataFrame(
        [(0, "k1", "a b c"), (1, "k1", "c b zz a"), (2, "k2", "x y y"),
         (3, "k2", "z"), (4, "k1", ""), (5, "nomodel", "a b")],
        "doc_id long, k string, text string")
    keyed = {r["doc_id"]: (r["n_events"], r["avg_logprob"], r["ppl"])
             for r in text.kn_ngram_score_keyed(
                 docs, {"k1": m1, "k2": m2}, "k").collect()}
    assert set(keyed) == {0, 1, 2, 3, 4}  # key 'nomodel' drops
    for key, model in (("k1", m1), ("k2", m2)):
        part = docs.where(F.col("k") == key)
        for r in text.kn_ngram_score(part, model).collect():
            ke, ka, kp = keyed[r["doc_id"]]
            assert ke == r["n_events"]
            assert ka == pytest.approx(r["avg_logprob"], rel=1e-12)
            assert kp == pytest.approx(r["ppl"], rel=1e-12)
    m2b = text.kn_ngram_lm(t2, order=2)
    with pytest.raises(ValueError):
        text.kn_ngram_score_keyed(docs, {"k1": m1, "k2": m2b}, "k")
    # ccnet_pipeline with mixed orders still works via the union path
    seed = spark.createDataFrame(
        [(i, "en", "a b c a b") for i in range(6)],
        "doc_id long, lang string, text string")
    w = text.train_lang_classifier(seed, iters=2)
    mixed = text.ccnet_pipeline(
        docs.select("doc_id", "text"), w,
        {"en": m1, None: m2b}).collect()
    assert len(mixed) == 6


# ---------------------------------------------------- Kneser-Ney bigram
def _py_kn(train_texts, score_docs, discount=0.75, alpha=0.5):
    """Python twin of kn_bigram_lm + kn_bigram_score: same <s>/</s>
    events, same single-discount interpolated KN with alpha-smoothed
    continuation fallback."""
    import math

    def events(txt):
        ts = [t for t in txt.lower().strip().split() if t]
        return list(zip(["<s>"] + ts, ts + ["</s>"]))

    cuw = {}
    for t in train_texts:
        for e in events(t):
            cuw[e] = cuw.get(e, 0) + 1
    cu, n1u, n1w = {}, {}, {}
    for (u, w), c in cuw.items():
        cu[u] = cu.get(u, 0) + c
        n1u[u] = n1u.get(u, 0) + 1
        n1w[w] = n1w.get(w, 0) + 1
    n1pp = len(cuw)
    v = len(n1w)

    def p(u, w):
        pc = (n1w.get(w, 0) + alpha) / (n1pp + alpha * (v + 1))
        if cu.get(u, 0) > 0:
            return (max(cuw.get((u, w), 0) - discount, 0.0)
                    + discount * n1u[u] * pc) / cu[u]
        return pc

    out = {}
    for did, txt in score_docs:
        lps = [math.log(p(u, w)) for u, w in events(txt)]
        avg = sum(lps) / len(lps)
        out[did] = (len(lps), avg, math.exp(-avg))
    return out


def test_kn_bigram_twin(spark):
    """Trained tables and per-doc scores match the python twin on a
    randomized corpus, including OOV words, unseen contexts, repeated
    bigrams and an empty document (whose single <s>,</s> event is still
    scored). Pins the discount, the continuation smoothing and the
    BOS/EOS event construction."""
    import random

    rng = random.Random(11)
    vocab = ["the", "cat", "sat", "on", "mat", "dog", "ran", "far"]
    train_rows = [(i, " ".join(rng.choices(vocab, k=rng.randrange(2, 9))))
                  for i in range(25)]
    train = spark.createDataFrame(train_rows, "doc_id long, text string")
    model = text.kn_bigram_lm(train)
    score_rows = [(100, "the cat sat on the mat"),
                  (101, "dog unknownword ran"),   # OOV word
                  (102, "zz qq"),                 # fully OOV
                  (103, "")]                      # empty doc
    docs = spark.createDataFrame(score_rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_events"], r["avg_logprob"], r["ppl"])
           for r in text.kn_bigram_score(docs, model).collect()}
    ref = _py_kn([t for _, t in train_rows], score_rows)
    assert set(got) == set(ref)
    for did in ref:
        assert got[did][0] == ref[did][0], did
        assert abs(got[did][1] - ref[did][1]) < 1e-9, (did, got[did], ref[did])
        assert abs(got[did][2] - ref[did][2]) < 1e-6 * ref[did][2]


def test_kn_bigram_self_scored_identical(spark):
    """``self_scored=True`` (sound when the score corpus is the train
    corpus) reproduces the default three-join path: the window-attached
    (cu, n1u) are exact integer aggregates equal to ctx's, every
    event's bigram matches, and the per-event float expression tree is
    unchanged — so each event's logprob is the same double and the
    per-doc means agree to summation-order reassociation (the same
    run-to-run tolerance the default path itself has). Pins the r17
    ctx-join removal's equivalence contract."""
    import random

    rng = random.Random(23)
    vocab = ["the", "cat", "sat", "on", "mat", "dog", "ran", "far"]
    rows = [(i, " ".join(rng.choices(vocab, k=rng.randrange(2, 9))))
            for i in range(30)] + [(30, "")]  # empty doc: <s>→</s> in model
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    model = text.kn_bigram_lm(docs)
    base = {r["doc_id"]: (r["n_events"], r["avg_logprob"], r["ppl"])
            for r in text.kn_bigram_score(docs, model).collect()}
    fast = {r["doc_id"]: (r["n_events"], r["avg_logprob"], r["ppl"])
            for r in text.kn_bigram_score(
                docs, model, self_scored=True).collect()}
    assert set(base) == set(fast)
    for did in base:
        assert base[did][0] == fast[did][0], did
        assert abs(base[did][1] - fast[did][1]) <= 1e-12 * abs(base[did][1])
        assert abs(base[did][2] - fast[did][2]) <= 1e-12 * base[did][2]


def test_kn_bigram_ranks_fluency(spark):
    """Behavioral contract: under a model trained on patterned text,
    in-distribution documents score lower perplexity than shuffled or
    gibberish ones — the CCNet filter signal."""
    train = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog") for i in range(20)],
        "doc_id long, text string")
    model = text.kn_bigram_lm(train)
    docs = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog"),
         (1, "dog lazy the over jumps fox brown quick the"),
         (2, "zz qq ww ee rr tt")],
        "doc_id long, text string")
    ppl = {r["doc_id"]: r["ppl"] for r in
           text.kn_bigram_score(docs, model).collect()}
    # in-distribution text beats both by orders of magnitude; shuffled
    # vs gibberish is NOT asserted — on a tiny training set a confident
    # seen context leaves less mass for an unseen continuation than the
    # global fallback grants a fully-OOV event (a known KN trait)
    assert ppl[0] * 20 < ppl[1] and ppl[0] * 20 < ppl[2], ppl


def test_ivf_assigned_corpus_numpy_matches_expr(spark):
    """assign="numpy" reproduces the literal-expression inverted lists:
    bit-equal on dyadic-rational vectors (exact float dots) including a
    zero vector (expr path callers pre-filter those; numpy path returns
    NULL centroid_id), and id-equal on the real embeddings table."""
    import random

    rng = random.Random(3)
    cents = [(c, [rng.randrange(-8, 9) / 8.0 for _ in range(4)])
             for c in range(5)]
    rows = [(i, [rng.randrange(-32, 33) / 16.0 for _ in range(4)])
            for i in range(60)] + [(60, [0.0] * 4)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    nz = df.where(F.expr("exists(embedding, x -> x != 0.0D)"))
    e = {r["neighbor_id"]: (r["centroid_id"], r["cnorm"]) for r in
         ann.ivf_assigned_corpus(nz, cents).collect()}
    n = {r["neighbor_id"]: (r["centroid_id"], r["cnorm"]) for r in
         ann.ivf_assigned_corpus(df, cents, assign="numpy").collect()}
    assert n[60][0] is None  # zero vector → NULL centroid on the numpy path
    assert {k: v for k, v in n.items() if k != 60} == e
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents2 = [(int(r[0]), list(r[1])) for r in
              emb.where(F.col("vec_id") < 16)
              .select("vec_id", "embedding").orderBy("vec_id").collect()]
    e2 = {r["neighbor_id"]: r["centroid_id"] for r in
          ann.ivf_assigned_corpus(emb, cents2).collect()}
    n2 = {r["neighbor_id"]: r["centroid_id"] for r in
          ann.ivf_assigned_corpus(emb, cents2, assign="numpy").collect()}
    assert e2 == n2


def test_assign_centroids_np_null_vector(spark):
    """A NULL or empty embedding yields (null, null) like the expression
    path's null propagation, instead of crashing the Arrow batch."""
    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, None), (2, [])],
        "vec_id long, embedding array<double>",
    ).selectExpr("vec_id", "embedding", "struct(1L AS h1, 2L AS h2) AS _vkey")
    got = {r["vec_id"]: (r["_cid"], r["_csim"]) for r in
           ann.assign_centroids_np(df, [(0, [1.0, 0.0]), (1, [0.0, 1.0])])
           .collect()}
    assert got[0] == (0, 1.0)
    assert got[1] == (None, None) and got[2] == (None, None)


def test_bpe_encode_ids(spark):
    """Encoded id streams reproduce the python recomputation: ids rank
    pieces by weighted frequency (ties by piece), OOV char-fallback
    pieces unseen in training map to oov_id, empty docs encode to []."""
    train = spark.createDataFrame(
        [(0, "low low lower lowest")], "doc_id long, text string")
    merges, vocab = text.bpe_train(train, n_merges=2)
    vrows = {r["w"]: list(r["symbols"]) for r in vocab.collect()}
    # python twin of the id assignment
    freq = {}
    wc = {"low": 2, "lower": 1, "lowest": 1}
    for w, syms in vrows.items():
        for s in syms:
            freq[s] = freq.get(s, 0) + wc[w]
    ranked = sorted(freq, key=lambda p: (-freq[p], p))
    pid = {p: i for i, p in enumerate(ranked)}
    ids = {r["piece"]: r["piece_id"] for r in text.bpe_vocab_ids(vocab).collect()}
    assert ids == pid
    docs = spark.createDataFrame(
        [(1, "lower zap low"), (2, "")], "doc_id long, text string")
    got = {r["doc_id"]: (list(r["token_ids"]), r["n_tokens"])
           for r in text.bpe_encode(docs, vocab).collect()}
    pieces = vrows["lower"] + ["z", "a", "p"] + vrows["low"]
    want = [pid.get(p, -1) for p in pieces]
    assert got[1] == (want, len(want))
    # 'a' never appears in training pieces → must be oov_id
    assert pid.get("a") is None and -1 in got[1][0]
    assert got[2] == ([], 0)


# ------------------------------------------------- curation composition
def test_curation_v2_composition(spark):
    """The late-round curation ops compose end-to-end as one DataFrame
    program — template cleaning → repeated-span removal → quality-
    classifier gate → DSIR selection → BPE encode → sequence packing —
    and the chain is deterministic: same inputs, same survivors, same
    token-id streams, same bins across two full executions."""
    import random

    from logrange_spark.ops import dedup, sampling

    rng = random.Random(23)
    vocab = ["the", "model", "learns", "from", "clean", "web", "text",
             "tokens", "data", "scale"]
    footer = "subscribe to our newsletter"
    rows = []
    for i in range(60):
        body = " ".join(rng.choices(vocab, k=rng.randrange(6, 14)))
        rows.append((i, body + "\n" + footer))
    for i in range(60, 80):  # junk the quality gate should score low
        rows.append((i, f"zz{i} qq{i}\n" + footer))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    def run_chain():
        cleaned = text.remove_boilerplate(docs).select("doc_id", "text")
        despanned = dedup.remove_repeated_spans(cleaned)
        despanned = despanned.select("doc_id", F.col("text"))
        pos = despanned.where(F.col("doc_id") < 20)
        neg = despanned.where(F.col("doc_id") >= 60)
        w = text.train_quality_classifier(pos, neg, iters=3)
        scored = text.quality_classifier_score(despanned, w)
        kept = despanned.join(
            scored.where(F.col("score") > 0.5).select("doc_id"), "doc_id"
        )
        picked = sampling.dsir_sample(kept, pos, k=15)
        sel = kept.join(picked.select("doc_id"), "doc_id")
        merges, bvocab = text.bpe_train(sel, n_merges=8)
        enc = text.bpe_encode(sel, bvocab)
        packed = sampling.pack_sequences(enc, max_tokens=64)
        return (
            sorted(r["doc_id"] for r in picked.collect()),
            sorted((r["doc_id"], tuple(r["token_ids"])) for r in enc.collect()),
            sorted((r["doc_id"], r["bin_id"], r["bin_offset"])
                   for r in packed.collect()),
        )

    picked1, enc1, packed1 = run_chain()
    assert len(picked1) == 15
    assert all(d < 60 for d in picked1), picked1  # junk never selected
    assert all(ids for _, ids in enc1)  # every survivor encodes non-empty
    # footer removed before spans/classifier: no survivor text kept it
    picked2, enc2, packed2 = run_chain()
    assert (picked1, enc1, packed1) == (picked2, enc2, packed2)


def test_null_text_totality(spark):
    """Null-text documents behave like empty ones across the late-round
    text ops instead of silently vanishing: dsir scores them logw 0, the
    KN scorer scores the single <s>,</s> event, bpe encodes []."""
    from logrange_spark.ops import sampling

    docs = spark.createDataFrame(
        [(0, "real text here"), (1, None)], "doc_id long, text string")
    ratios = sampling.dsir_logratios(docs.where("doc_id = 0"), docs)
    got = {r["doc_id"]: (r["n_terms"], r["logw"]) for r in
           sampling.dsir_scores(docs, ratios).collect()}
    assert got[1] == (0, 0.0) and got[0][0] == 5  # 3 unigrams + 2 bigrams
    model = text.kn_bigram_lm(docs.where("doc_id = 0"))
    kn = {r["doc_id"]: r["n_events"] for r in
          text.kn_bigram_score(docs, model).collect()}
    assert kn == {0: 4, 1: 1}
    merges, vocab = text.bpe_train(docs, n_merges=2, min_word_count=1)
    enc = {r["doc_id"]: r["n_tokens"] for r in
           text.bpe_encode(docs, vocab).collect()}
    assert enc[1] == 0 and enc[0] > 0


def test_lang_classifier_trained(spark):
    """One-vs-rest trained language ID: three synthetic languages with
    disjoint vocabulary train from a labeled seed; held-out docs predict
    their language with high confidence, a vocabulary-free doc still
    gets a deterministic prediction (intercept-only scoring), and the
    prediction is reproducible."""
    import random

    rng = random.Random(7)
    vocabs = {
        "aa": ["mor", "til", "den", "som", "har", "var"],
        "bb": ["le", "une", "des", "avec", "pour", "dans"],
        "cc": ["der", "und", "das", "mit", "eine", "auch"],
    }
    rows = []
    i = 0
    for lang, vs in vocabs.items():
        for _ in range(12):
            rows.append((i, lang, " ".join(rng.choices(vs, k=8)))); i += 1
    seed = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    w = text.train_lang_classifier(seed, iters=4)
    held = spark.createDataFrame(
        [(100, " ".join(rng.choices(vocabs["aa"], k=6))),
         (101, " ".join(rng.choices(vocabs["bb"], k=6))),
         (102, " ".join(rng.choices(vocabs["cc"], k=6))),
         (103, "zz qq ww")],
        "doc_id long, text string")
    got = {r["doc_id"]: (r["lang_pred"], r["score"]) for r in
           text.lang_classifier_predict(held, w).collect()}
    assert got[100][0] == "aa" and got[100][1] > 0.8
    assert got[101][0] == "bb" and got[101][1] > 0.8
    assert got[102][0] == "cc" and got[102][1] > 0.8
    assert got[103][0] in vocabs  # deterministic fallback, some language
    again = {r["doc_id"]: r["lang_pred"] for r in
             text.lang_classifier_predict(held, w).collect()}
    assert {d: v[0] for d, v in got.items()} == again


# --------------------------------------------------- Kneser-Ney order-n
def _py_kn_n(train_texts, score_docs, order=3, D=0.75, alpha=0.5):
    """Python twin of kn_ngram_lm + kn_ngram_score: top-order raw
    counts, lower-order continuation counts derived by suffix grouping,
    one shared discount, interpolation folded from the smoothed
    continuation unigram upward."""
    import math

    def toks(txt):
        return [t for t in txt.lower().strip().split() if t]

    def events(txt):
        ts = toks(txt)
        padded = ["<s>"] * (order - 1) + ts
        ws = ts + ["</s>"]
        return [(tuple(padded[i:i + order - 1]), ws[i])
                for i in range(len(ws))]

    cn = {}
    top = {}
    for t in train_texts:
        for ctx, w in events(t):
            top[(ctx, w)] = top.get((ctx, w), 0) + 1
    cn[order] = top
    for k in range(order - 1, 1, -1):
        lower = {}
        for ctx, w in cn[k + 1]:
            key = (ctx[1:], w)
            lower[key] = lower.get(key, 0) + 1
        cn[k] = lower
    ctxs = {}
    for k, tbl in cn.items():
        agg = {}
        for (ctx, w), c in tbl.items():
            cu, n1 = agg.get(ctx, (0, 0))
            agg[ctx] = (cu + c, n1 + 1)
        ctxs[k] = agg
    n1w = {}
    for ctx, w in cn[2]:
        n1w[w] = n1w.get(w, 0) + 1
    n1pp, v = len(cn[2]), len(n1w)

    def p(ctx, w):
        pr = (n1w.get(w, 0) + alpha) / (n1pp + alpha * (v + 1))
        for k in range(2, order + 1):
            suf = ctx[len(ctx) - (k - 1):]
            cu_n1 = ctxs[k].get(suf)
            if cu_n1 and cu_n1[0] > 0:
                c = cn[k].get((suf, w), 0)
                pr = (max(c - D, 0.0) + D * cu_n1[1] * pr) / cu_n1[0]
        return pr

    out = {}
    for did, txt in score_docs:
        lps = [math.log(p(ctx, w)) for ctx, w in events(txt)]
        avg = sum(lps) / len(lps)
        out[did] = (len(lps), avg, math.exp(-avg))
    return out


def test_kn_ngram_order2_equals_bigram(spark):
    """The general order-n model at order=2 reproduces the dedicated
    bigram implementation on every document (per-event arithmetic is
    identical; per-doc means agree to reassociation ulps)."""
    train = spark.createDataFrame(
        [(i, "the cat sat on the mat the dog ran") for i in range(15)],
        "doc_id long, text string")
    docs = spark.createDataFrame(
        [(0, "the cat sat"), (1, "dog zz ran"), (2, "")],
        "doc_id long, text string")
    b = {r["doc_id"]: (r["n_events"], r["avg_logprob"]) for r in
         text.kn_bigram_score(docs, text.kn_bigram_lm(train)).collect()}
    n = {r["doc_id"]: (r["n_events"], r["avg_logprob"]) for r in
         text.kn_ngram_score(docs, text.kn_ngram_lm(train, order=2)).collect()}
    assert set(b) == set(n)
    for did in b:
        assert b[did][0] == n[did][0]
        assert abs(b[did][1] - n[did][1]) < 1e-12 * max(1.0, abs(b[did][1]))


def test_kn_trigram_twin(spark):
    """Order-3 model matches the python twin on a randomized corpus,
    including OOV words, unseen histories whose bigram suffix IS seen
    (the partial-backoff path), repeated trigrams and an empty doc."""
    import random

    rng = random.Random(29)
    vocab = ["the", "cat", "sat", "on", "mat", "dog", "ran", "far", "big"]
    train_rows = [(i, " ".join(rng.choices(vocab, k=rng.randrange(3, 10))))
                  for i in range(30)]
    train = spark.createDataFrame(train_rows, "doc_id long, text string")
    model = text.kn_ngram_lm(train, order=3)
    score_rows = [(100, "the cat sat on the mat"),
                  (101, "mat the cat"),            # seen words, new order
                  (102, "dog unknownword ran"),    # OOV word
                  (103, "")]                       # empty doc
    docs = spark.createDataFrame(score_rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_events"], r["avg_logprob"], r["ppl"])
           for r in text.kn_ngram_score(docs, model).collect()}
    ref = _py_kn_n([t for _, t in train_rows], score_rows, order=3)
    assert set(got) == set(ref)
    for did in ref:
        assert got[did][0] == ref[did][0], did
        assert abs(got[did][1] - ref[did][1]) < 1e-9, (did, got[did], ref[did])
        assert abs(got[did][2] - ref[did][2]) < 1e-6 * ref[did][2]


def test_kn_5gram_twin(spark):
    """The order loop holds at depth: a 5-gram model (CCNet's production
    order) matches the python twin — four continuation-table derivations
    and a 4-deep interpolation fold, exercised on text long enough for
    full-order histories plus short docs that live entirely in the
    <s>-padded prefix."""
    import random

    rng = random.Random(31)
    vocab = ["a", "b", "c", "d", "e", "f"]
    train_rows = [(i, " ".join(rng.choices(vocab, k=rng.randrange(2, 12))))
                  for i in range(25)]
    train = spark.createDataFrame(train_rows, "doc_id long, text string")
    model = text.kn_ngram_lm(train, order=5)
    score_rows = [(0, "a b c d e f a b"), (1, "f e"), (2, "zz a b")]
    docs = spark.createDataFrame(score_rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_events"], r["avg_logprob"])
           for r in text.kn_ngram_score(docs, model).collect()}
    ref = _py_kn_n([t for _, t in train_rows], score_rows, order=5)
    for did in ref:
        assert got[did][0] == ref[did][0]
        assert abs(got[did][1] - ref[did][1]) < 1e-9, (did, got[did], ref[did])


def test_kn_min_count_pruning(spark):
    """KenLM-style per-order pruning: min_count=1 is a no-op; a {k: t}
    dict filters order k's count table to c >= t BEFORE lower tables
    derive; scoring a pruned model equals scoring a manually-filtered
    copy of the full model (pruned n-grams back off like unseen ones)
    and stays total."""
    import random

    rng = random.Random(7)
    vocab = ["a", "b", "c", "d", "e"]
    rows = [(i, " ".join(rng.choices(vocab, k=rng.randrange(3, 10))))
            for i in range(30)]
    train = spark.createDataFrame(rows, "doc_id long, text string")
    full = text.kn_ngram_lm(train, order=3)
    noop = text.kn_ngram_lm(train, order=3, min_count=1)
    assert noop["counts"][3].count() == full["counts"][3].count()
    pruned = text.kn_ngram_lm(train, order=3, min_count={3: 2, 2: 2})
    n_full3 = full["counts"][3].count()
    n_pruned3 = pruned["counts"][3].count()
    assert 0 < n_pruned3 < n_full3  # singletons existed and were cut
    assert pruned["counts"][3].where("c < 2").count() == 0
    assert pruned["counts"][2].where("c < 2").count() == 0
    # manual twin: filter the full model's frames the same way; lower
    # tables must re-derive from the pruned top
    top = full["counts"][3].where("c >= 2")
    c2 = (top.groupBy(F.slice("ctx", 2, 1).alias("ctx"), "w")
          .agg(F.count(F.lit(1)).alias("c")).where("c >= 2"))
    manual = {
        "order": 3,
        "counts": {3: top, 2: c2},
        "contexts": {
            k: t.groupBy("ctx").agg(F.sum("c").alias("cu"),
                                    F.count(F.lit(1)).alias("n1u"))
            for k, t in {3: top, 2: c2}.items()
        },
        "unigram": c2.groupBy("w").agg(F.count(F.lit(1)).alias("n1w")),
        "totals": c2.agg(F.count(F.lit(1)).alias("n1pp"),
                         F.count_distinct("w").alias("v")),
    }
    docs = spark.createDataFrame(
        [(0, "a b c d"), (1, "e e e"), (2, "zz a"), (3, "")],
        "doc_id long, text string")
    got = {r["doc_id"]: r["avg_logprob"]
           for r in text.kn_ngram_score(docs, pruned).collect()}
    exp = {r["doc_id"]: r["avg_logprob"]
           for r in text.kn_ngram_score(docs, manual).collect()}
    assert set(got) == {0, 1, 2, 3}  # total, pruning never drops docs
    for did in exp:
        assert got[did] == pytest.approx(exp[did], rel=1e-12), did
    with pytest.raises(ValueError):
        text.kn_ngram_lm(train, order=3, min_count=0)


def test_bpe_segmentation_lossless_property(spark):
    """Invariant across random corpora: BPE merges never lose or invent
    characters — every vocab row's pieces concatenate back to the word,
    and every document's pieces concatenate to its token stream."""
    import random

    for seed in (3, 41, 97):
        rng = random.Random(seed)
        alphabet = "abcdef"
        words = ["".join(rng.choices(alphabet, k=rng.randrange(1, 9)))
                 for _ in range(30)]
        rows = [(i, " ".join(rng.choices(words, k=rng.randrange(1, 7))))
                for i in range(25)]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        merges, vocab = text.bpe_train(docs, n_merges=15)
        for r in vocab.collect():
            assert "".join(r["symbols"]) == r["w"], (seed, r)
        got = {r["doc_id"]: "".join(r["pieces"]) for r in
               text.bpe_segment(docs, vocab).collect()}
        for i, t in rows:
            assert got[i] == "".join(t.split()), (seed, i)


def test_dsir_exhaustive_k_returns_all(spark):
    """k at least the corpus size returns every document exactly once —
    Gumbel top-k degenerates to the identity selection."""
    from logrange_spark.ops import sampling

    docs = spark.createDataFrame(
        [(i, f"doc number {i} text") for i in range(12)] + [(99, "")],
        "doc_id long, text string")
    got = sorted(r["doc_id"] for r in
                 sampling.dsir_sample(docs, docs.limit(3), k=100).collect())
    assert got == sorted([*range(12), 99])


def test_cluster_representatives_keep_best(spark):
    """Quality-aware representative selection: highest score wins, score
    ties break to min id, unscored members lose to any scored one, and
    an all-unscored cluster falls back to min id (total coverage)."""
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4), (5, 5), (6, 5), (7, 7), (8, 7)],
        "doc_id long, cluster_id long")
    scores = spark.createDataFrame(
        [(1, 0.4), (2, 0.9), (3, None), (5, 0.7), (6, 0.7)],
        "doc_id long, score double")
    reps = {r["cluster_id"]: (r["keep_id"], r["keep_score"], r["size"])
            for r in dedup.cluster_representatives(clusters, scores).collect()}
    assert reps[1] == (2, 0.9, 3)
    assert reps[4] == (4, float("-inf"), 1)  # singleton, unscored
    assert reps[5] == (5, 0.7, 2)            # tie -> min id
    assert reps[7] == (7, float("-inf"), 2)  # all-unscored cluster
    drops = {r["doc_id"]
             for r in dedup.keep_best_drops(clusters, scores).collect()}
    assert drops == {1, 3, 6, 8}
    # complement: keeps ∪ drops = all ids, disjoint
    keeps = {v[0] for v in reps.values()}
    assert keeps | drops == set(range(1, 9)) and not (keeps & drops)


def test_cluster_representatives_nan_scores(spark):
    """NaN scores are treated as missing (−∞): Spark's ordering ranks
    NaN above every real double, so without the nanvl guard keep_score
    (max) would return NaN while keep_id (min_by on −score) picked a
    real-scored member — the pair must stay consistent."""
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 3), (4, 3)], "doc_id long, cluster_id long")
    scores = spark.createDataFrame(
        [(1, float("nan")), (2, 0.2), (3, float("nan")), (4, float("nan"))],
        "doc_id long, score double")
    reps = {r["cluster_id"]: (r["keep_id"], r["keep_score"])
            for r in dedup.cluster_representatives(clusters, scores).collect()}
    assert reps[1] == (2, 0.2)               # real score beats NaN
    assert reps[3] == (3, float("-inf"))     # all-NaN -> min id, -inf
    drops = {r["doc_id"]
             for r in dedup.keep_best_drops(clusters, scores).collect()}
    assert drops == {1, 4}


def test_cluster_representatives_duckdb_twin(spark):
    """Differential vs a DuckDB window recomputation on a randomized
    cluster/score set with partial scorer coverage."""
    import duckdb

    n = 300
    cl_rows = [(i, i % 37) for i in range(n)]
    sc_rows = [(i, ((i * 13) % 97) / 100.0) for i in range(n) if i % 5 != 0]
    clusters = spark.createDataFrame(cl_rows, "doc_id long, cluster_id long")
    scores = spark.createDataFrame(sc_rows, "doc_id long, score double")
    got = sorted(
        (r["cluster_id"], r["keep_id"], r["keep_score"], r["size"])
        for r in dedup.cluster_representatives(clusters, scores).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE cl(doc_id BIGINT, cluster_id BIGINT)")
    con.executemany("INSERT INTO cl VALUES (?, ?)", cl_rows)
    con.execute("CREATE TABLE sc(doc_id BIGINT, score DOUBLE)")
    con.executemany("INSERT INTO sc VALUES (?, ?)", sc_rows)
    exp = con.execute("""
        SELECT cluster_id, keep_id, keep_score, size FROM (
          SELECT cluster_id, cl.doc_id AS keep_id,
                 coalesce(score, '-infinity'::DOUBLE) AS keep_score,
                 count(*) OVER (PARTITION BY cluster_id) AS size,
                 row_number() OVER (
                   PARTITION BY cluster_id
                   ORDER BY coalesce(score, '-infinity'::DOUBLE) DESC,
                            cl.doc_id) AS rn
          FROM cl LEFT JOIN sc ON cl.doc_id = sc.doc_id)
        WHERE rn = 1 ORDER BY cluster_id""").fetchall()
    assert got == [tuple(r) for r in exp]


def test_shard_corpus_deterministic_dense_total(spark):
    from logrange_spark.ops import sampling
    import hashlib

    n_shards, n = 7, 500
    df = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    out = sampling.shard_corpus(df, n_shards).collect()
    assert len(out) == n
    m1 = {r["doc_id"]: (r["shard_id"], r["shard_pos"]) for r in out}
    # dense 1..k positions per shard
    by_shard: dict[int, list[int]] = {}
    for sid, pos in m1.values():
        assert 0 <= sid < n_shards
        by_shard.setdefault(sid, []).append(pos)
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    # layout-independent: identical mapping from a repartitioned input
    m2 = {r["doc_id"]: (r["shard_id"], r["shard_pos"])
          for r in sampling.shard_corpus(df.repartition(13), n_shards).collect()}
    assert m1 == m2
    # python twin: full md5 ordering, first-8-hex shard assignment
    buckets: dict[int, list[tuple[str, int]]] = {}
    for i in range(n):
        d = hashlib.md5(f"|{i}".encode()).hexdigest()
        buckets.setdefault(int(d[:8], 16) % n_shards, []).append((d, i))
    exp = {}
    for sid, lst in buckets.items():
        for pos, (_, i) in enumerate(sorted(lst), 1):
            exp[i] = (sid, pos)
    assert m1 == exp
    # salt changes the order; n_shards=1 is a total order; 0 rejected
    m3 = {r["doc_id"]: (r["shard_id"], r["shard_pos"])
          for r in sampling.shard_corpus(df, n_shards, salt="s2").collect()}
    assert m3 != m1
    one = sampling.shard_corpus(df, 1)
    assert one.where("shard_id <> 0").count() == 0
    assert one.agg(F.max("shard_pos")).collect()[0][0] == n
    with pytest.raises(ValueError):
        sampling.shard_corpus(df, 0)


def test_corpus_report_exact_python_twin(spark):
    """The data-card numbers vs a direct python recomputation, with
    null/empty/duplicate docs in the mix; exact percentiles match
    numpy's linear interpolation (Spark `percentile` semantics)."""
    import hashlib

    import numpy as np

    from logrange_spark.ops import report

    texts = [
        "the quick brown fox", "the quick brown fox",  # exact dup
        "  ", None, "",                                 # empties
        "one two three four five six",
        "alpha beta gamma", "alpha beta gamma",         # exact dup
        "solo",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    row = report.corpus_report(df).collect()[0]
    toks = [(t or "").lower().split() for t in texts]
    nts = [len(t) for t in toks]
    hashes = {hashlib.md5((t or "").encode()).hexdigest() for t in texts}
    assert row["n_docs"] == len(texts)
    assert row["n_empty_docs"] == 3
    assert row["distinct_docs"] == len(hashes)
    assert row["dup_frac"] == pytest.approx(
        (len(texts) - len(hashes)) / len(texts))
    assert row["total_tokens"] == sum(nts)
    assert row["total_chars"] == sum(len(t or "") for t in texts)
    assert row["tokens_p50"] == pytest.approx(np.percentile(nts, 50))
    assert row["tokens_p95"] == pytest.approx(np.percentile(nts, 95))
    assert row["tokens_max"] == max(nts)
    assert row["vocab_size"] == len({w for t in toks for w in t})


def test_corpus_report_approx_within_tolerance(spark):
    """Sketch mode (HLL vocab + approx percentiles) lands within
    tolerance of exact on a corpus with a known vocabulary."""
    from logrange_spark.ops import report

    rows = [(i, " ".join(f"w{(i * 7 + j) % 500}" for j in range(20)))
            for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    exact = report.corpus_report(df).collect()[0]
    approx = report.corpus_report(df, approx=True, rsd=0.02).collect()[0]
    assert exact["vocab_size"] == 500
    assert abs(approx["vocab_size"] - 500) <= 500 * 0.06
    assert approx["tokens_p50"] == pytest.approx(exact["tokens_p50"], abs=1)
    assert approx["n_docs"] == exact["n_docs"] == 400
    assert approx["dup_frac"] == exact["dup_frac"] == 0.0


def test_corpus_report_empty_corpus(spark):
    from logrange_spark.ops import report

    df = spark.createDataFrame([], "doc_id long, text string")
    row = report.corpus_report(df).collect()[0]
    assert row["n_docs"] == 0 and row["distinct_docs"] == 0
    assert row["dup_frac"] == 0.0 and row["vocab_size"] == 0


def test_curation_v3_keep_best_and_shard_composition(spark):
    """Round-10 pieces compose with the existing chain: Gopher gate →
    near-dup clustering with QUALITY-AWARE representative selection →
    deterministic sharding — and keep-best provably diverges from
    keep-first when the higher-quality copy has the larger id."""
    from logrange_spark.ops import dedup, report, sampling

    # 20 mutually-distinct docs (disjoint vocab + a few shared stopwords
    # — cross-doc Jaccard « 0.7, so only the planted pairs cluster)
    rows = [
        (i, f"doc {i} " + " ".join(f"w{i * 40 + j}" for j in range(20))
            + " the and of it")
        for i in range(20)
    ]
    # pair A: doc 100 is doc 5 mangled with heavy symbol soup — enough
    # punctuation mass to swamp its token-volume gain, so the LOWER id
    # is also the higher-quality copy (keep-best agrees with keep-first)
    rows.append((100, rows[5][1].replace(
        "the and of", "!!! ??? ;;; ,,, !!! ??? ;;; ,,, the and of !!!")))
    # pair B: doc 101 is doc 7 plus extra CLEAN stopword-rich text — a
    # strict token superset (Jaccard ≈ 0.8), strictly higher score, and
    # the HIGHER id: keep-best must diverge from keep-first here
    rows.append((101, rows[7][1] + " and then was over for a night"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    def run():
        gated = text.gopher_gate(text.gopher_quality_stats(docs))
        clusters = dedup.near_duplicate_clusters(docs, "doc_id", "text", 0.7)
        scores = docs.select(
            "doc_id", text.quality_score(F.col("text")).alias("score"))
        keep = dedup.cluster_representatives(clusters, scores)
        drops = dedup.keep_best_drops(clusters, scores)
        kept = docs.join(drops, "doc_id", "left_anti")
        sharded = sampling.shard_corpus(kept, 4, salt="v3")
        card = report.corpus_report(kept).collect()[0]
        return (
            sorted(r["doc_id"] for r in gated.collect()),
            sorted((r["cluster_id"], r["keep_id"]) for r in keep.collect()),
            sorted((r["doc_id"], r["shard_id"], r["shard_pos"])
                   for r in sharded.collect()),
            (card["n_docs"], card["distinct_docs"]),
        )

    g1, k1, s1, c1 = run()
    g2, k2, s2, c2 = run()
    assert (g1, k1, s1, c1) == (g2, k2, s2, c2)  # fully deterministic
    # pair A: symbol soup loses — keep-best retains the clean doc 5
    keeps = {kid for _, kid in k1}
    assert 5 in keeps and 100 not in keeps
    # pair B: the clean SUPERSET copy wins despite the larger id —
    # keep-best diverges from keep-first (which would retain doc 7)
    assert 101 in keeps and 7 not in keeps
    # every kept doc appears exactly once in the shard map
    kept_ids = {d for d, _, _ in s1}
    assert len(kept_ids) == len(s1) == c1[0]


def test_html_extract_text_core():
    """The stdlib extractor: skip containers, block newlines, entity
    decode, NBSP normalization, title capture, tag-soup totality."""
    from logrange_spark.ops.html import extract_text

    text, title = extract_text(
        "<html><head><title> My Page </title><style>p{color:red}</style>"
        "<script>var x=1;</script></head><body>"
        "<h1>Heading</h1><p>First&nbsp;para with <b>bold</b> and "
        "&amp; entity.</p><ul><li>one</li><li>two</li></ul>"
        "<noscript>hidden</noscript><div>tail</div></body></html>")
    assert title == "My Page"
    assert text.splitlines() == [
        "Heading", "First para with bold and & entity.", "one", "two",
        "tail"]
    # malformed soup: unclosed tags, stray closers, no head
    text2, title2 = extract_text(
        "<title>T2<p>alpha <i>beta</div></span><p>gamma")
    assert title2 == "T2"
    assert "alpha beta" in text2 and "gamma" in text2
    assert extract_text(None) == (None, None)
    assert extract_text("")[0] == ""


def test_html_documents_end_to_end_from_warc(spark, tmp_path):
    """WARC response → html_documents → documents-shaped text: the full
    crawl-to-corpus path, including a meta-charset (latin-1) page and a
    non-HTML payload (total, empty text)."""
    from logrange_spark.ingest import wet
    from logrange_spark.ops import html as ophtml
    from pyspark.sql import functions as SF

    latin = ("<html><head><meta charset=\"iso-8859-1\"><title>caf\xe9"
             "</title></head><body><p>caf\xe9 au lait</p>"
             ).encode("iso-8859-1")
    pages = [
        ("http://a/p1", b"<html><body><p>hello world</p>"
                        b"<script>skip()</script></body></html>"),
        ("http://a/p2", latin),
        ("http://a/bin", b"\x00\x01binary junk"),
    ]
    buf = b""
    for uri, payload in pages:
        body = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                + payload)
        buf += (f"WARC/1.0\r\nWARC-Type: response\r\n"
                f"WARC-Target-URI: {uri}\r\n"
                f"Content-Length: {len(body)}\r\n\r\n").encode() \
            + body + b"\r\n\r\n"
    (tmp_path / "c.warc").write_bytes(buf)
    warc = wet.read_warc(spark, str(tmp_path))
    bridged = warc.select(
        SF.xxhash64("path", "record_offset").alias("doc_id"),
        SF.col("target_uri").alias("url"), "payload")
    docs = {r["url"]: r for r in ophtml.html_documents(bridged).collect()}
    assert docs["http://a/p1"]["text"] == "hello world"
    assert docs["http://a/p2"]["title"] == "café"
    assert docs["http://a/p2"]["text"] == "café au lait"
    assert docs["http://a/bin"]["text"] is not None  # total, not dropped
    # no shuffle in the plan — same contract as the WET readers
    plan = ophtml.html_documents(bridged)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_blocklist_gate(spark):
    """C4 banned-word filter: word-boundary matching on the lowercased
    raw text — punctuation-attached occurrences and multi-word phrases
    hit (Raffel et al. §2.2 semantics); substrings of longer words do
    NOT; max_hits tolerance; null totality; DuckDB twin on the same
    compiled pattern."""
    rows = [(0, "clean text about spark plans"),
            (1, "one BadWord here"),
            (2, "badword badword twice plus other words"),
            (3, None),
            (4, ""),
            (5, "punctuation-attached: badword! and (badword)"),
            (6, "a bad  phrase spans   whitespace; bad phrase, twice"),
            (7, "substring notbadword badwordish stays clean"),
            (8, "unicode 另一个 hit")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    wl = ["badword", "Bad Phrase", "另一个"]
    got = {r["doc_id"]: (r["blocklist_hits"], r["blocklist_pass"])
           for r in text.blocklist_gate(docs, wl).collect()}
    assert got == {0: (0, True), 1: (1, False), 2: (2, False),
                   3: (0, True), 4: (0, True), 5: (2, False),
                   6: (2, False), 7: (0, True), 8: (1, False)}
    relaxed = {r["doc_id"]: r["blocklist_pass"]
               for r in text.blocklist_gate(docs, wl, max_hits=1).collect()}
    assert relaxed == {0: True, 1: True, 2: False, 3: True, 4: True,
                       5: False, 6: False, 7: True, 8: True}
    # DuckDB twin: same pattern string, RE2 side
    import duckdb

    pat = text.blocklist_pattern(wl)
    twin = {i: duckdb.sql(
        "select len(regexp_extract_all(lower(?), ?))",
        params=[t, pat]).fetchone()[0]
        for i, t in rows if t is not None}
    assert twin == {i: h for i, (h, _) in got.items() if i not in (3,)}
    with pytest.raises(ValueError):
        text.blocklist_gate(docs, [])
        text.blocklist_gate(docs, ["  "])


def test_blocklist_pattern_longest_first(spark):
    """Java/RE2 alternation is leftmost-FIRST, not leftmost-longest: a
    short entry listed before a longer phrase sharing its prefix would
    consume the prefix and the phrase entry could never match as a
    phrase. The pattern must order alternatives longest-first so phrase
    entries win — pinned via extraction on BOTH engines."""
    import duckdb
    from pyspark.sql import functions as F

    pat = text.blocklist_pattern(["bad", "bad word"])
    assert pat.index("bad\\s+word") < pat.index("|\\bbad\\b")
    got = (
        spark.range(1)
        .select(F.regexp_extract(F.lit("a bad word here"), pat, 0).alias("m"))
        .collect()[0]["m"]
    )
    assert got == "bad word"
    twin = duckdb.sql(
        "select regexp_extract('a bad word here', ?)", params=[pat]
    ).fetchone()[0]
    assert twin == "bad word"
    # counts still agree engine-vs-oracle with prefix-sharing entries
    rows = [(0, "bad word bad"), (1, "bad"), (2, "word")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got_hits = {
        r["doc_id"]: r["blocklist_hits"]
        for r in text.blocklist_gate(docs, ["bad", "bad word"]).collect()
    }
    twin_hits = {
        i: duckdb.sql(
            "select len(regexp_extract_all(lower(?), ?))", params=[t, pat]
        ).fetchone()[0]
        for i, t in rows
    }
    assert got_hits == twin_hits == {0: 2, 1: 1, 2: 0}


# ------------------------------------------------------------ C4 line rules
def test_c4_line_rules_crafted(spark):
    """Each C4 §2.2 rule on a crafted page: terminal punctuation,
    ≥5-word lines, javascript lines, lorem-ipsum / brace / sentence
    page gates."""
    page = "\n".join([
        "This line has five words total.",      # kept
        "Too short.",                            # <5 words
        "this line has no terminal punctuation", # no terminal
        "Enable javascript to view this page.",  # javascript
        "  A padded line with exactly six words!  ",  # kept (trimmed)
        "",                                      # blank
        'He said "five words are enough"',       # kept (quote terminal)
    ])
    rows = [
        (1, page),
        (2, "Lorem ipsum dolor sit amet here."),       # lorem gate
        (3, "A code page { with braces } five words."),  # brace gate
        (4, "One good sentence of five words."),         # <3 sentences
        (5, None),                                       # null text
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in text.c4_line_rules(df).collect()}
    r1 = out[1]
    assert r1["n_lines"] == 6 and r1["n_kept"] == 3
    assert r1["text"].splitlines() == [
        "This line has five words total.",
        "A padded line with exactly six words!",
        'He said "five words are enough"',
    ]
    assert r1["n_sentences"] == 2  # the quote line ends without .!?
    assert not r1["c4_pass"]  # < 3 sentences after cleaning
    assert out[2]["has_lorem_ipsum"] and not out[2]["c4_pass"]
    assert out[3]["has_brace"] and not out[3]["c4_pass"]
    assert not out[4]["c4_pass"] and out[4]["n_kept"] == 1
    assert out[5]["n_lines"] == 0 and not out[5]["c4_pass"]
    # a passing page: three kept sentences, no gates tripped
    good = "\n".join(
        f"Sentence number {i} has six words." for i in range(3)
    )
    g = text.c4_line_rules(
        spark.createDataFrame([(9, good)], "doc_id long, text string")
    ).collect()[0]
    assert g["c4_pass"] and g["n_kept"] == 3 and g["n_sentences"] == 3


def test_c4_line_rules_matches_duckdb(spark):
    """Full DuckDB recomputation over a derived multi-line corpus: the
    operator is a pure expression chain, so every column must match a
    plain-SQL twin exactly."""
    import os

    import duckdb

    sf = "/root/testdata/sf0.01"
    if not os.path.isdir(sf):
        pytest.skip("sf0.01 testdata not present")
    derive = (
        "concat(text, ' more words to pass.', chr(10), "
        "CASE WHEN doc_id % 3 = 0 THEN 'Enable javascript now please.' "
        "WHEN doc_id % 3 = 1 THEN 'A perfectly good sentence right here.' "
        "ELSE 'short one.' END, chr(10), "
        "CASE WHEN doc_id % 5 = 0 THEN 'Brace yourself { for code.' "
        "WHEN doc_id % 5 = 1 THEN 'lorem ipsum filler text here.' "
        "ELSE 'Another fine sentence with many words!' END)"
    )
    docs = spark.read.parquet(f"{sf}/documents.parquet").selectExpr(
        "doc_id", f"{derive} AS text"
    )
    got = sorted(
        tuple(r) for r in text.c4_line_rules(docs).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    term = r'(\.|!|\?|")$'
    sql = f"""
WITH d AS (SELECT doc_id, {derive} AS raw FROM documents),
l AS (SELECT doc_id, raw,
        list_filter(list_transform(string_split(raw, chr(10)),
                                   x -> trim(x)), x -> x <> '') AS lines
      FROM d),
k AS (SELECT doc_id, raw, lines,
        list_filter(lines, x -> regexp_matches(x, '{term}')
          AND len(list_filter(string_split_regex(x, '\\s+'),
                              w -> w <> '')) >= 5
          AND NOT contains(lower(x), 'javascript')) AS kept
      FROM l)
SELECT doc_id,
       array_to_string(kept, chr(10)) AS text,
       CAST(len(lines) AS INT) AS n_lines,
       CAST(len(kept) AS INT) AS n_kept,
       CAST(len(regexp_extract_all(array_to_string(kept, chr(10)),
                                   '[.!?]+')) AS INT) AS n_sentences,
       contains(lower(raw), 'lorem ipsum') AS has_lorem_ipsum,
       contains(raw, '{{') AS has_brace,
       (len(regexp_extract_all(array_to_string(kept, chr(10)), '[.!?]+'))
          >= 3
        AND NOT contains(lower(raw), 'lorem ipsum')
        AND NOT contains(raw, '{{')) AS c4_pass
FROM k
"""
    want = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert len(got) == 500 and got == want


# ------------------------------------------------------ quality signals
def test_quality_signals_matches_individual_ops(spark):
    """The one-pass Dolma-style attribute row must be column-identical
    to the five individual operators it composes, and its plan must be
    a pure map — NO Exchange of any kind (one parquet scan at 100 TB,
    vs five scans + four joins for the op-at-a-time composition)."""
    import os

    sf = "/root/testdata/sf0.01"
    if not os.path.isdir(sf):
        pytest.skip("sf0.01 testdata not present")
    derive = (
        "concat(text, ' tail words to end.', chr(10), "
        "CASE WHEN doc_id % 3 = 0 THEN 'Enable javascript now please.' "
        "ELSE 'A perfectly good sentence right here.' END, chr(10), "
        "CASE WHEN doc_id % 5 = 0 THEN 'Brace yourself { for code.' "
        "WHEN doc_id % 5 = 1 THEN 'lorem ipsum filler text here.' "
        "WHEN doc_id % 7 = 0 THEN concat('Mail user', doc_id, "
        "'@example.com about 123456789 now.') "
        "ELSE 'Another fine sentence with many words!' END)"
    )
    docs = spark.read.parquet(f"{sf}/documents.parquet").selectExpr(
        "doc_id", f"{derive} AS text"
    )
    blocklist = ("slow query",)
    sig = text.quality_signals(docs, blocklist=blocklist)
    plan = sig._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan

    rows = {r["doc_id"]: r for r in sig.collect()}
    assert len(rows) == 500

    gop = {
        r["doc_id"]: r
        for r in text.gopher_gate(text.gopher_quality_stats(docs)).collect()
    }
    rep = {r["doc_id"]: r for r in text.repetition_stats(docs).collect()}
    c4 = {r["doc_id"]: r for r in text.c4_line_rules(docs).collect()}
    red = {r["doc_id"]: r for r in text.redact(docs).collect()}
    blk = {
        r["doc_id"]: r for r in text.blocklist_gate(docs, blocklist).collect()
    }
    ts = {
        (r["doc_id"]): r
        for r in docs.select(
            "doc_id", F.length("text").alias("n_chars")
        ).collect()
    }
    from logrange_spark.ops.text import lang_id

    langs = {
        r["doc_id"]: r["lang"]
        for r in docs.select(
            "doc_id", lang_id(F.col("text")).alias("lang")
        ).collect()
    }
    for d, r in rows.items():
        for k in ("n_words", "mean_word_len", "symbol_word_ratio",
                  "bullet_line_frac", "ellipsis_line_frac",
                  "alpha_word_frac", "stopword_hits", "gopher_pass"):
            assert r[k] == gop[d][k], (d, k)
        for k in ("n_lines", "dup_line_frac", "dup_line_char_frac",
                  "top_ngram_char_frac"):
            assert r[k] == rep[d][k], (d, k)
        for k in ("n_kept", "n_sentences", "has_lorem_ipsum", "has_brace",
                  "c4_pass"):
            assert r[k] == c4[d][k], (d, k)
        for k in ("n_emails", "n_ips", "n_longnums"):
            assert r[k] == red[d][k], (d, k)
        for k in ("blocklist_hits", "blocklist_pass"):
            assert r[k] == blk[d][k], (d, k)
        assert r["n_chars"] == ts[d]["n_chars"] and r["lang"] == langs[d], d
