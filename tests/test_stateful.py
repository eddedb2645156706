"""Streaming stateful dedup (applyInPandasWithState) — beyond-reference;
the reference's pipes keep no record state (pkg/pipe/worker.go:48-104)."""

import json
import os
import time

import pytest


def test_stateful_dedupe_across_batches(spark, tmp_path):
    """Two files processed as separate micro-batches (maxFilesPerTrigger=1):
    a key admitted in batch 0 must be suppressed in batch 1 via the state
    store, and within a batch only the first occurrence survives."""
    from logrange_spark.streaming.stateful import stateful_dedupe

    src_dir = tmp_path / "dedup_in"
    src_dir.mkdir()
    b0 = [
        {"k": "a", "v": 1},
        {"k": "a", "v": 2},  # within-batch duplicate → dropped
        {"k": "b", "v": 3},
    ]
    b1 = [
        {"k": "a", "v": 4},  # cross-batch duplicate → dropped by state
        {"k": "c", "v": 5},
    ]
    (src_dir / "0.json").write_text("\n".join(json.dumps(r) for r in b0))
    (src_dir / "1.json").write_text("\n".join(json.dumps(r) for r in b1))
    # the file source orders batches by modification time — pin it so
    # batch 0 really is 0.json
    os.utime(src_dir / "0.json", (time.time() - 60, time.time() - 60))

    stream = (
        spark.readStream.schema("k string, v long")
        .option("maxFilesPerTrigger", 1)
        .json(str(src_dir))
    )
    q = (
        stateful_dedupe(stream, ["k"])
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["k"]: r["v"] for r in spark.sql("SELECT * FROM dedup_out").collect()}
    assert got == {"a": 1, "b": 3, "c": 5}


def test_continuous_corpus_dedup_stream(spark, tmp_path):
    """End-to-end continuous dedup: bootstrap a corpus (with an internal
    near-dup that must collapse), stream two shards — duplicates of the
    corpus and of each other are dropped, novel docs append to both the
    corpus files and the probe tables, and a doc duplicating a
    FIRST-shard novel doc is caught by the incrementally-updated state."""
    import os
    import time

    from pyspark.sql import functions as F

    from logrange_spark.streaming.corpus_dedup import (
        bootstrap_corpus,
        start_corpus_dedup_stream,
    )

    name, root = "ccd", str(tmp_path)
    for t in ("bands", "toks", "members", "ids"):
        spark.sql(f"DROP TABLE IF EXISTS {name}_{t}")
    seed_rows = [
        (1, "alpha document about spark engines and large scale shuffles"),
        (2, "alpha document about spark engines and large scale shuffles"),  # dup of 1
        (3, "beta document describing parquet file layouts and row groups"),
    ]
    seed = spark.createDataFrame(seed_rows, "doc_id long, text string")
    docs, *_ = bootstrap_corpus(spark, seed, name, f"{root}/{name}")
    assert sorted(r["doc_id"] for r in docs.collect()) == [1, 3]

    inp = f"{root}/incoming"
    os.makedirs(inp, exist_ok=True)
    q = start_corpus_dedup_stream(
        spark, inp, name, f"{root}/{name}", f"{root}/ckpt",
        "doc_id long, text string", threshold=0.7,
    )
    try:
        # shard 1: one corpus dup, one novel (+ its in-shard dup)
        spark.createDataFrame(
            [
                (10, "alpha document about spark engines and large scale shuffles"),
                (11, "gamma text with entirely fresh content tokens one two three"),
                (12, "gamma text with entirely fresh content tokens one two three"),
            ],
            "doc_id long, text string",
        ).coalesce(1).write.mode("append").parquet(inp)

        def corpus_ids():
            try:
                return sorted(
                    r["doc_id"]
                    for r in spark.read.parquet(f"{root}/{name}_docs").collect()
                )
            except Exception:
                return []

        deadline = time.time() + 60
        while corpus_ids() != [1, 3, 11] and time.time() < deadline:
            time.sleep(0.5)
        assert corpus_ids() == [1, 3, 11], corpus_ids()

        # shard 2: a near-dup of shard-1's novel doc (caught by the
        # UPDATED probe state) and one more novel doc
        spark.createDataFrame(
            [
                (20, "gamma text with entirely fresh content tokens one two four"),
                (21, "delta payload completely unlike anything else whatsoever here"),
            ],
            "doc_id long, text string",
        ).coalesce(1).write.mode("append").parquet(inp)
        deadline = time.time() + 60
        while corpus_ids() != [1, 3, 11, 21] and time.time() < deadline:
            time.sleep(0.5)
        assert corpus_ids() == [1, 3, 11, 21], corpus_ids()
        # the guard-id sidecar tracked every streamed commit (r16
        # regression: cache invalidation emptied the novel set before
        # the guard insert). POLL: the corpus wait returns at the docs
        # write, which precedes the index inserts in the commit order
        def guard_ids():
            return sorted(
                r["doc_id"] for r in spark.table(f"{name}_ids").collect()
            )

        deadline = time.time() + 60
        while guard_ids() != [1, 3, 11, 21] and time.time() < deadline:
            time.sleep(0.5)
        assert guard_ids() == [1, 3, 11, 21], guard_ids()
    finally:
        q.stop()
        for t in ("bands", "toks", "members", "ids"):
            spark.sql(f"DROP TABLE IF EXISTS {name}_{t}")


def test_continuous_embedding_dedup_stream(spark, tmp_path):
    """Vector-side continuous dedup parity: bootstrap (internal identical
    pair collapses), stream two shards — duplicates of the corpus and of
    each other are dropped, novel vectors append to the corpus files AND
    the probe tables, and a vector duplicating a FIRST-shard novel one is
    caught by the incrementally-updated state."""
    import os
    import random
    import time

    from logrange_spark.streaming.embedding_dedup import (
        bootstrap_embedding_corpus,
        start_embedding_dedup_stream,
    )

    rng = random.Random(21)

    def vec():
        return [float(rng.uniform(-1, 1)) for _ in range(16)]

    name, root = "ced", str(tmp_path)
    for t in ("vecs", "members", "ids"):
        spark.sql(f"DROP TABLE IF EXISTS {name}_{t}")
    v1, v3 = vec(), vec()
    seed = spark.createDataFrame(
        [(1, v1), (2, v1), (3, v3)], "vec_id long, embedding array<float>"
    )
    docs, _vt, _mt, dims = bootstrap_embedding_corpus(
        spark, seed, name, f"{root}/{name}", threshold=0.98
    )
    assert sorted(r["vec_id"] for r in docs.collect()) == [1, 3]

    inp = f"{root}/incoming"
    os.makedirs(inp, exist_ok=True)
    q = start_embedding_dedup_stream(
        spark, inp, name, f"{root}/{name}", f"{root}/ckpt",
        "vec_id long, embedding array<float>", dims, threshold=0.98,
    )
    try:
        v11 = vec()
        spark.createDataFrame(
            [(10, v1), (11, v11), (12, v11)],
            "vec_id long, embedding array<float>",
        ).coalesce(1).write.mode("append").parquet(inp)

        def corpus_ids():
            try:
                return sorted(
                    r["vec_id"]
                    for r in spark.read.parquet(f"{root}/{name}_docs").collect()
                )
            except Exception:
                return []

        deadline = time.time() + 180
        while corpus_ids() != [1, 3, 11] and time.time() < deadline:
            time.sleep(0.5)
            if q.exception():
                break
        assert q.exception() is None, q.exception()
        assert corpus_ids() == [1, 3, 11], corpus_ids()

        # shard 2: an exact copy of shard-1's novel vector (caught by the
        # UPDATED probe state) and one more novel vector
        spark.createDataFrame(
            [(20, v11), (21, vec())], "vec_id long, embedding array<float>"
        ).coalesce(1).write.mode("append").parquet(inp)
        deadline = time.time() + 180
        while corpus_ids() != [1, 3, 11, 21] and time.time() < deadline:
            time.sleep(0.5)
            if q.exception():
                break
        assert q.exception() is None, q.exception()
        assert corpus_ids() == [1, 3, 11, 21], corpus_ids()
        # the guard-id sidecar tracked every streamed commit (r16
        # regression: cache invalidation emptied the novel set before
        # the guard insert). POLL: the corpus wait returns at the docs
        # write, which precedes the index inserts in the commit order
        def guard_ids():
            return sorted(
                r["id"] for r in spark.table(f"{name}_ids").collect()
            )

        deadline = time.time() + 60
        while guard_ids() != [1, 3, 11, 21] and time.time() < deadline:
            time.sleep(0.5)
        assert guard_ids() == [1, 3, 11, 21], guard_ids()
    finally:
        q.stop()
        for t in ("vecs", "members", "ids"):
            spark.sql(f"DROP TABLE IF EXISTS {name}_{t}")


def test_continuous_quality_stream(spark, tmp_path):
    """End-to-end continuous curation: persisted classifier weights +
    DSIR ratios gate two streamed shards — in-distribution docs survive
    with scores attached, junk is dropped by the classifier gate, and
    off-target docs by the DSIR gate; results equal the batch
    recomputation over the union of shards."""
    import os
    import time

    from pyspark.sql import functions as F

    from logrange_spark.ops.sampling import dsir_scores
    from logrange_spark.ops.text import quality_classifier_score
    from logrange_spark.streaming.curation import (
        persist_dsir_ratios,
        persist_quality_model,
        start_quality_stream,
    )

    root = str(tmp_path)
    good = [(i, "the quick brown fox jumps over the lazy dog") for i in range(12)]
    junk = [(100 + i, f"zz{i} qq{i} xx{i}") for i in range(12)]
    pos = spark.createDataFrame(good, "doc_id long, text string")
    neg = spark.createDataFrame(junk, "doc_id long, text string")
    weights = persist_quality_model(spark, pos, neg, f"{root}/w", iters=4)
    ratios = persist_dsir_ratios(
        spark, pos, pos.unionByName(neg), f"{root}/r"
    )

    inp = f"{root}/incoming"
    os.makedirs(inp, exist_ok=True)
    shard1 = [(200, "quick brown fox over the lazy dog"),  # survives both
              (201, "zz1 qq1 xx1")]                        # classifier-dropped
    shard2 = [(300, "the quick brown fox jumps far"),      # survives both
              (301, "zz9 qq9 xx9")]
    q = start_quality_stream(
        spark, inp, f"{root}/out", f"{root}/ckpt",
        "doc_id long, text string", weights,
        ratios=ratios, min_score=0.5, min_logw=0.0,
    )
    try:
        spark.createDataFrame(shard1, "doc_id long, text string") \
            .coalesce(1).write.mode("append").parquet(inp)

        def out_ids():
            try:
                return sorted(r["doc_id"] for r in
                              spark.read.parquet(f"{root}/out").collect())
            except Exception:
                return []

        deadline = time.time() + 60
        while out_ids() != [200] and time.time() < deadline:
            time.sleep(0.5)
        assert out_ids() == [200], out_ids()
        spark.createDataFrame(shard2, "doc_id long, text string") \
            .coalesce(1).write.mode("append").parquet(inp)
        deadline = time.time() + 60
        while out_ids() != [200, 300] and time.time() < deadline:
            time.sleep(0.5)
        assert out_ids() == [200, 300], out_ids()
    finally:
        q.stop()
    # streamed survivors carry the same scores the batch path computes
    allrows = spark.createDataFrame(shard1 + shard2, "doc_id long, text string")
    want_s = {r["doc_id"]: r["score"] for r in
              quality_classifier_score(allrows, weights).collect()}
    got = {r["doc_id"]: r["score"] for r in
           spark.read.parquet(f"{root}/out").collect()}
    for did, s in got.items():
        assert abs(s - want_s[did]) < 1e-9
    lw = {r["doc_id"]: r["logw"] for r in
          dsir_scores(allrows, ratios).collect()}
    assert all(lw[d] >= 0.0 for d in got)


def test_continuous_curation_full_gate_stack(spark, tmp_path):
    """The stream composes the COMPLETE per-document gate stack of the
    batch `curation_full` pipeline — persisted boilerplate dictionary
    (text rewrite), Gopher repetition gate, classifier gate, DSIR
    gate — and each gate individually fires; streamed survivors (ids,
    cleaned text, scores) equal the batch recomputation of the same
    stages over the union of the shards."""
    import os
    import time

    from pyspark.sql import functions as F

    from logrange_spark.ops.sampling import dsir_scores
    from logrange_spark.ops.text import (
        quality_classifier_score,
        remove_boilerplate_with,
        repetition_stats,
    )
    from logrange_spark.streaming.curation import (
        persist_boilerplate_dict,
        persist_dsir_ratios,
        persist_quality_model,
        start_quality_stream,
    )

    root = str(tmp_path)
    good = [(i, "the quick brown fox jumps over the lazy dog")
            for i in range(12)]
    junk = [(100 + i, f"zz{i} qq{i} xx{i}") for i in range(12)]
    pos = spark.createDataFrame(good, "doc_id long, text string")
    neg = spark.createDataFrame(junk, "doc_id long, text string")
    weights = persist_quality_model(spark, pos, neg, f"{root}/w", iters=4)
    ratios = persist_dsir_ratios(spark, pos, pos.unionByName(neg),
                                 f"{root}/r")
    banner_corpus = spark.createDataFrame(
        [(500 + i, f"filler{i} words here\nSUBSCRIBE NOW")
         for i in range(20)],
        "doc_id long, text string")
    bp = persist_boilerplate_dict(spark, banner_corpus, f"{root}/bp")
    assert [r["line"] for r in bp.collect()] == ["SUBSCRIBE NOW"]

    inp = f"{root}/incoming"
    os.makedirs(inp, exist_ok=True)
    # 200: survives; banner removed by the dictionary, then all gates
    #      (pre-checked: dup 0.0, top-ngram 0.143, score 0.79, logw > 0)
    # 201: repetition-gated ONLY (classifier scores it 0.97 — duplicated
    #      in-distribution lines are exactly what Gopher adds)
    # 202: classifier/DSIR-gated ONLY (diverse junk: dup 0.0, top-ngram
    #      0.18 pass Gopher; score 0.14, logw -11 fail the model gates)
    shard1 = [
        (200, "quick brown fox over the lazy dog jumps again and many "
              "other animals watch from green hills under bright skies"
              "\nSUBSCRIBE NOW"),
        (201, "the quick brown fox\n" * 8),
        (202, "zz1 qq2 xx3 zz4 qq5 xx6 zz7 qq8 xx9 zz10 qq11 xx0 "
              "zz2 qq3 xx4 zz5"),
    ]
    # 300: survives untouched (no banner; dup 0.0, top-ngram 0.189,
    #      score 0.74, logw > 0)
    shard2 = [(300, "the quick brown fox jumps far across wide rivers "
                    "and tall mountains watching silver clouds drift "
                    "slowly overhead")]
    q = start_quality_stream(
        spark, inp, f"{root}/out", f"{root}/ckpt",
        "doc_id long, text string", weights,
        ratios=ratios, boilerplate=bp,
        min_score=0.5, min_logw=0.0,
        max_dup_line_frac=0.3, max_top_ngram_char_frac=0.2,
    )
    try:
        spark.createDataFrame(shard1, "doc_id long, text string") \
            .coalesce(1).write.mode("append").parquet(inp)

        def out_rows():
            try:
                return {r["doc_id"]: r for r in
                        spark.read.parquet(f"{root}/out").collect()}
            except Exception:
                return {}

        deadline = time.time() + 60
        while sorted(out_rows()) != [200] and time.time() < deadline:
            time.sleep(0.5)
        assert sorted(out_rows()) == [200], sorted(out_rows())
        # the survivor's text is the CLEANED rebuild (banner gone)
        assert out_rows()[200]["text"] == (
            "quick brown fox over the lazy dog jumps again and many "
            "other animals watch from green hills under bright skies")
        spark.createDataFrame(shard2, "doc_id long, text string") \
            .coalesce(1).write.mode("append").parquet(inp)
        deadline = time.time() + 60
        while sorted(out_rows()) != [200, 300] and time.time() < deadline:
            time.sleep(0.5)
        assert sorted(out_rows()) == [200, 300], sorted(out_rows())
    finally:
        q.stop()

    # batch recomputation of the same stages over the union of shards
    union = spark.createDataFrame(shard1 + shard2,
                                  "doc_id long, text string")
    cleaned = remove_boilerplate_with(union, bp).select("doc_id", "text")
    rep_ok = (
        repetition_stats(cleaned)
        .where((F.col("dup_line_frac") <= 0.3)
               & (F.col("top_ngram_char_frac") <= 0.2))
        .select("doc_id"))
    gated = cleaned.join(rep_ok, "doc_id")
    sc = quality_classifier_score(gated, weights).select("doc_id", "score")
    kept = gated.join(sc.where(F.col("score") >= 0.5), "doc_id")
    lw = dsir_scores(gated, ratios).select("doc_id", "logw")
    kept = kept.join(lw.where(F.col("logw") >= 0.0), "doc_id")
    want = {r["doc_id"]: r for r in kept.collect()}
    got = out_rows()
    assert sorted(got) == sorted(want)
    for did in want:
        assert got[did]["text"] == want[did]["text"]
        assert abs(got[did]["score"] - want[did]["score"]) < 1e-9
        assert abs(got[did]["logw"] - want[did]["logw"]) < 1e-9


def test_continuous_curation_gopher_document_gate(spark, tmp_path):
    """The Gopher table-A1 DOCUMENT rules run as a stream gate
    (gopher_kw): a doc failing ONLY the word-count bound is dropped
    even though the classifier likes it; survivors equal the batch
    recomputation with the same thresholds."""
    import os
    import time

    from pyspark.sql import functions as F

    from logrange_spark.ops.text import (
        gopher_gate,
        gopher_quality_stats,
        quality_classifier_score,
    )
    from logrange_spark.streaming.curation import (
        persist_quality_model,
        start_quality_stream,
    )

    root = str(tmp_path)
    wordy = ("the quick brown fox jumps over the lazy dog and then "
             "runs away into the green field while birds watch")
    pos = spark.createDataFrame(
        [(i, wordy) for i in range(10)], "doc_id long, text string")
    neg = spark.createDataFrame(
        [(100 + i, f"zz{i} qq{i} xx{i}") for i in range(10)],
        "doc_id long, text string")
    weights = persist_quality_model(spark, pos, neg, f"{root}/w", iters=4)

    inp = f"{root}/incoming"
    os.makedirs(inp, exist_ok=True)
    gk = {"min_words": 12, "min_stopword_hits": 1}
    shard = [
        (200, wordy),                          # passes every gate
        (201, "the quick brown fox jumps"),    # fails ONLY min_words
    ]
    q = start_quality_stream(
        spark, inp, f"{root}/out", f"{root}/ckpt",
        "doc_id long, text string", weights,
        min_score=0.5, gopher_kw=gk,
    )
    try:
        spark.createDataFrame(shard, "doc_id long, text string") \
            .coalesce(1).write.mode("append").parquet(inp)

        def out_ids():
            try:
                return sorted(r["doc_id"] for r in
                              spark.read.parquet(f"{root}/out").collect())
            except Exception:
                return []

        deadline = time.time() + 60
        while out_ids() != [200] and time.time() < deadline:
            time.sleep(0.5)
        assert out_ids() == [200], out_ids()
    finally:
        q.stop()

    # sanity: 201 fails only the gopher word bound, not the classifier
    union = spark.createDataFrame(shard, "doc_id long, text string")
    g = {r["doc_id"]: r["gopher_pass"] for r in
         gopher_gate(gopher_quality_stats(union), **gk).collect()}
    assert g == {200: True, 201: False}
    sc = {r["doc_id"]: r["score"] for r in
          quality_classifier_score(union, weights).collect()}
    assert sc[201] >= 0.5  # the classifier alone would have kept it


def test_continuous_fingerprint_dedup_stream(spark, tmp_path):
    """Fingerprint-side continuous dedup parity (r14): bootstrap drops
    an internal near-dup (hamming 7 at max_hamming=7 — fixture
    distances pre-verified: the planted pair sits at 7, every cross
    pair at ≥21), stream two shards — corpus dups and in-shard dups
    drop, novel docs append to the corpus files AND the banded index,
    and a duplicate of a FIRST-shard novel doc is caught by the
    incrementally-updated index."""
    import os
    import time

    from logrange_spark.streaming.corpus_dedup import (
        bootstrap_fingerprint_corpus,
        start_fingerprint_dedup_stream,
    )

    name, root = "cfd", str(tmp_path)
    for t in ("fps", "fp_members", "fp_ids"):
        spark.sql(f"DROP TABLE IF EXISTS {name}_{t}")
    base = (
        "alpha document about spark engines and large scale shuffles "
        "with partitions executors stages tasks codegen arrow pages "
        "buffers metrics plans catalyst tungsten joins aggregates windows"
    )
    gam = (
        "gamma text with entirely fresh content tokens describing lakehouse "
        "tables manifests snapshots compaction clustering ordering statistics "
        "pruning vectors embeddings sketches minhash bands signatures buckets"
    )
    delta = (
        "delta payload completely unlike anything else whatsoever here "
        "covering syslog forwarders collectors parsers offsets journals "
        "chunks cursors positions watermarks follow tails pipes workers"
    )
    eps = (
        "epsilon report enumerating benchmark protocols noise floors medians "
        "ratios budgets heaps sweeps artifacts attribution deltas registries "
        "oracles twins hashes rotations retirements coverage inventories"
    )
    seed = spark.createDataFrame(
        [(1, base), (2, base.replace("metrics", "metric")), (3, gam)],
        "doc_id long, text string",
    )
    docs, _fps, _members = bootstrap_fingerprint_corpus(
        spark, seed, name, f"{root}/{name}", max_hamming=7, n_buckets=8
    )
    assert sorted(r["doc_id"] for r in docs.collect()) == [1, 3]

    inp = f"{root}/incoming"
    os.makedirs(inp, exist_ok=True)
    q = start_fingerprint_dedup_stream(
        spark, inp, name, f"{root}/{name}", f"{root}/ckpt",
        "doc_id long, text string", max_hamming=7,
    )
    try:
        # shard 1: a corpus dup (exact base), one novel (+ exact in-shard dup)
        spark.createDataFrame(
            [(10, base), (11, delta), (12, delta)],
            "doc_id long, text string",
        ).coalesce(1).write.mode("append").parquet(inp)

        def corpus_ids():
            try:
                return sorted(
                    r["doc_id"]
                    for r in spark.read.parquet(f"{root}/{name}_docs").collect()
                )
            except Exception:
                return []

        deadline = time.time() + 180
        while corpus_ids() != [1, 3, 11] and time.time() < deadline:
            time.sleep(0.5)
            if q.exception():
                break
        assert q.exception() is None, q.exception()
        assert corpus_ids() == [1, 3, 11], corpus_ids()

        # shard 2: a dup of shard-1's novel doc (caught by the UPDATED
        # index) and one genuinely new doc
        spark.createDataFrame(
            [(20, delta), (21, eps)],
            "doc_id long, text string",
        ).coalesce(1).write.mode("append").parquet(inp)
        deadline = time.time() + 180
        while corpus_ids() != [1, 3, 11, 21] and time.time() < deadline:
            time.sleep(0.5)
            if q.exception():
                break
        assert q.exception() is None, q.exception()
        assert corpus_ids() == [1, 3, 11, 21], corpus_ids()

        # the index holds exactly the corpus docs, one hash each here —
        # the members insert runs LAST in the batch (the replay-guard
        # ordering), so poll rather than racing the in-flight insert
        def member_ids():
            return sorted(
                r["doc_id"]
                for r in spark.table(f"{name}_fp_members").collect()
            )

        deadline = time.time() + 60
        while member_ids() != [1, 3, 11, 21] and time.time() < deadline:
            time.sleep(0.5)
        assert member_ids() == [1, 3, 11, 21], member_ids()
    finally:
        q.stop()
        for t in ("fps", "fp_members", "fp_ids"):
            spark.sql(f"DROP TABLE IF EXISTS {name}_{t}")


def test_streaming_cc_capstone(spark, tmp_path):
    """Streaming twin of the cc_pipeline capstone (r15): bootstrap
    builds the gated+deduped+scored seed corpus and persists every
    bounded model (boilerplate dictionary, LM vocab, tercile cuts,
    fingerprint index); the stream then runs gates → fingerprint probe
    → redact → LM score → bucket per shard. Asserts: gate drops,
    corpus-dup drops, in-shard dup drops, index catch of an earlier
    shard's novel doc across a STREAM RESTART, redelivery idempotence,
    and score equality with the batch recomputation. Fixture Hamming
    distances on the GATE-CLEANED text are pre-verified: every planted
    near pair sits at ≤10 (1-3:10, 1-10:8, 3-10:6, 12-13:5, 12-20:5),
    every cross pair at ≥18 — max_hamming=12 splits them with margin
    on both sides."""
    from logrange_spark.ops.text import redact, unigram_lm_score
    from logrange_spark.streaming.cc_ingest import (
        bootstrap_cc_corpus,
        start_cc_ingest_stream,
    )

    name, root = "ccs", str(tmp_path)
    for t in ("fps", "fp_members", "fp_ids"):
        spark.sql(f"DROP TABLE IF EXISTS {name}_{t}")

    def page(body_words, n_lines=4):
        # C4-passing page: ≥5-word sentences with terminal periods and
        # the shared boilerplate line sprinkled in
        line = "the quality of " + " ".join(body_words) + " must be seen."
        return "\n".join(
            [line] * n_lines + ["subscribe to our newsletter today."]
        )

    seed_rows = [
        (1, page(["alpha", "spark", "engines", "shuffles", "arrow"])),
        (2, page(["beta", "lakehouse", "tables", "manifests", "pruning"])),
        # near-dup of 1 (tiny edit) — bootstrap keep-first drops it
        (3, page(["alpha", "spark", "engines", "shuffles", "arrows"])),
        (4, "short."),  # C4 page gate fail
        (5, page(["casino", "casino", "jackpot", "winnings", "tonight"])),
    ]
    seed = spark.createDataFrame(seed_rows, "doc_id long, text string")
    gop = {"min_words": 8, "min_stopword_hits": 1,
           "max_symbol_word_ratio": 1.0}
    state = bootstrap_cc_corpus(
        spark, seed, name, f"{root}/{name}", ["casino"], gopher_kw=gop,
        max_hamming=12, n_buckets=8, min_docs=2, min_doc_frac=0.3,
    )
    got = {r["doc_id"]: r for r in state["docs"].collect()}
    assert sorted(got) == [1, 2]
    assert all(
        r["bucket"] in ("head", "middle", "tail") for r in got.values()
    )
    # the persisted boilerplate dictionary removed the shared line
    assert "newsletter" not in got[1]["text"]

    inp = f"{root}/incoming"
    os.makedirs(inp, exist_ok=True)
    q = start_cc_ingest_stream(
        spark, inp, name, f"{root}/{name}", f"{root}/ckpt",
        "doc_id long, text string", ["casino"], gopher_kw=gop,
        max_hamming=12,
    )

    def corpus():
        try:
            return {
                r["doc_id"]: r
                for r in spark.read.parquet(f"{root}/{name}_docs").collect()
            }
        except Exception:
            return {}

    def wait_for(ids, q):
        deadline = time.time() + 180
        while sorted(corpus()) != ids and time.time() < deadline:
            time.sleep(0.5)
            if q.exception():
                break
        assert q.exception() is None, q.exception()
        assert sorted(corpus()) == ids, sorted(corpus())

    novel = page(["gamma", "syslog", "forwarders", "parsers", "offsets"])
    try:
        # shard 1: corpus dup (near 1), gate fail (blocklist), in-shard
        # dup pair (one survives), novel
        spark.createDataFrame(
            [
                (10, page(["alpha", "spark", "engines", "shuffles",
                           "arrowz"])),
                (11, page(["casino", "poker", "jackpot", "slots",
                           "bonus"])),
                (12, novel),
                (13, novel.replace("gamma", "gamm0")),
            ],
            "doc_id long, text string",
        ).coalesce(1).write.mode("append").parquet(inp)
        wait_for([1, 2, 12], q)

        # redelivery idempotence: the SAME documents arrive again as a
        # new file — every id is in the members table, so the replay
        # guard drops the whole shard
        spark.createDataFrame(
            [(12, novel)], "doc_id long, text string"
        ).coalesce(1).write.mode("append").parquet(inp)
        time.sleep(4.0)
        assert q.exception() is None, q.exception()
        assert sorted(corpus()) == [1, 2, 12]

        # stream RESTART (crash recovery): the checkpoint resumes and
        # the UPDATED index still catches shard-1's novel doc
        q.stop()
        q = start_cc_ingest_stream(
            spark, inp, name, f"{root}/{name}", f"{root}/ckpt",
            "doc_id long, text string", ["casino"], gopher_kw=gop,
            max_hamming=12,
        )
        spark.createDataFrame(
            [
                (20, novel.replace("gamma", "gamma1")),  # near-dup of 12
                (21, page(["epsilon", "registry", "oracles", "twins",
                           "hashes"])),
            ],
            "doc_id long, text string",
        ).coalesce(1).write.mode("append").parquet(inp)
        wait_for([1, 2, 12, 21], q)

        # batch equivalence: the streamed scores equal the batch
        # recomputation against the SAME persisted models
        vocab = spark.read.parquet(f"{root}/{name}_vocab")
        final = corpus()
        for doc_id in (12, 21):
            row = final[doc_id]
            d = spark.createDataFrame(
                [(doc_id, row["text"])], "doc_id long, text string"
            )
            red = redact(d)
            want = unigram_lm_score(red, "doc_id", "redacted",
                                    vocab=vocab).collect()[0]
            assert row["ppl"] == want["ppl"], (doc_id, row["ppl"], want)
            t1, t2 = state["thresholds"]
            exp = ("head" if row["ppl"] <= t1
                   else "middle" if row["ppl"] <= t2 else "tail")
            assert row["bucket"] == exp
    finally:
        q.stop()


def _fp_corpus_fixture(spark, tmp_path, name):
    """Bootstrapped fingerprint corpus (2 docs) + texts for the replay
    drills; planted distances mirror test_continuous_fingerprint_*."""
    from logrange_spark.streaming.corpus_dedup import (
        bootstrap_fingerprint_corpus,
    )

    base = (
        "alpha document about spark engines and large scale shuffles "
        "with partitions executors stages tasks codegen arrow pages "
        "buffers metrics plans catalyst tungsten joins aggregates windows"
    )
    delta = (
        "delta payload completely unlike anything else whatsoever here "
        "covering syslog forwarders collectors parsers offsets journals "
        "chunks cursors positions watermarks follow tails pipes workers"
    )
    eps = (
        "epsilon report enumerating benchmark protocols noise floors medians "
        "ratios budgets heaps sweeps artifacts attribution deltas registries "
        "oracles twins hashes rotations retirements coverage inventories"
    )
    for t in ("fps", "fp_members", "fp_ids"):
        spark.sql(f"DROP TABLE IF EXISTS {name}_{t}")
    seed = spark.createDataFrame(
        [(1, base), (2, eps)], "doc_id long, text string"
    )
    bootstrap_fingerprint_corpus(
        spark, seed, name, f"{tmp_path}/{name}", max_hamming=7, n_buckets=8
    )
    return delta


def _crash_replay_drill(spark, tmp_path, name, crash_after, transform=None):
    """Run fingerprint_probe_and_commit, kill it after ``crash_after``
    insertInto calls (0 = between the docs write and the bands insert,
    1 = between the bands insert and the members insert, 2 = between
    the members insert and the guard-id insert), replay the SAME
    batch, and assert exactly-once on ``_docs`` + index catch."""
    from pyspark.sql.readwriter import DataFrameWriter

    from logrange_spark.streaming.corpus_dedup import (
        fingerprint_probe_and_commit,
    )

    delta = _fp_corpus_fixture(spark, tmp_path, name)
    path = f"{tmp_path}/{name}"
    batch = spark.createDataFrame(
        [(11, delta)], "doc_id long, text string"
    )

    real_insert = DataFrameWriter.insertInto
    calls = {"n": 0}

    def failing_insert(self, table, overwrite=None):
        if calls["n"] == crash_after:
            calls["n"] += 1
            raise RuntimeError("injected crash inside the commit sequence")
        calls["n"] += 1
        if overwrite is None:
            return real_insert(self, table)
        return real_insert(self, table, overwrite)

    def commit():
        fingerprint_probe_and_commit(
            spark, batch, name, path, max_hamming=7,
            transform=transform, batch_id=7,
        )

    DataFrameWriter.insertInto = failing_insert
    try:
        with pytest.raises(RuntimeError, match="injected crash"):
            commit()
    finally:
        DataFrameWriter.insertInto = real_insert

    # the docs write landed before the crash (partial commit on disk);
    # for crashes before the members insert the index never
    # half-records, for the members→guard-id window (crash_after=2)
    # members is complete and only the sidecar row is missing
    docs = spark.read.parquet(f"{path}_docs")
    assert [r["doc_id"] for r in docs.where("doc_id = 11").collect()] == [11]
    assert spark.table(f"{name}_fp_members").where(
        "doc_id = 11"
    ).count() == (1 if crash_after >= 2 else 0)

    # REPLAY the same batch (foreachBatch redelivers the same epoch):
    # the per-batch overwrite partition replaces the partial attempt —
    # zero duplicate doc rows — and the index completes
    commit()
    docs = spark.read.parquet(f"{path}_docs")
    dup = (
        docs.groupBy("doc_id").count().where("count > 1").collect()
    )
    assert dup == [], dup
    assert docs.where("doc_id = 11").count() == 1
    assert (
        spark.table(f"{name}_fp_members").where("doc_id = 11").count() == 1
    )
    # ...and the guard-id sidecar completes too (r16 regression: the
    # members insert invalidates a persist-cached novel set, which
    # recomputes EMPTY against the now-complete index — the guard
    # insert then silently wrote nothing; the eager lineage cut pins
    # it). Exception: in the members→guard-id window the replay's
    # probe fully verifies, so the sidecar row is (documented-benign)
    # never inserted — the probe guards the id while its fingerprint
    # is live, and maintenance re-derives the sidecar from docs
    assert spark.table(f"{name}_fp_ids").where(
        "doc_id = 11"
    ).count() == (0 if crash_after >= 2 else 1)

    # the completed index catches a near-dup of the replayed doc
    probe = spark.createDataFrame(
        [(20, delta)], "doc_id long, text string"
    )
    fingerprint_probe_and_commit(
        spark, probe, name, path, max_hamming=7, transform=transform,
        batch_id=8,
    )
    docs = spark.read.parquet(f"{path}_docs")
    assert docs.where("doc_id = 20").count() == 0
    for t in ("fps", "fp_members", "fp_ids"):
        spark.sql(f"DROP TABLE IF EXISTS {name}_{t}")
    return docs


def test_fingerprint_commit_crash_before_bands_is_exactly_once(
    spark, tmp_path
):
    """r15 review finding #1: a crash BETWEEN the docs write and the
    bands insert must not duplicate docs on replay — the per-batch
    overwrite partition replaces the partial attempt."""
    _crash_replay_drill(spark, tmp_path, "cr0", crash_after=0)


def test_fingerprint_commit_crash_between_bands_and_members(
    spark, tmp_path
):
    """The other crash window: bands landed, members didn't. Replay
    must not duplicate docs OR lose the document; the only residue is
    a (harmless, distinct()-collapsed) duplicate band row."""
    _crash_replay_drill(spark, tmp_path, "cr1", crash_after=1)


def test_fingerprint_commit_crash_between_members_and_guard_ids(
    spark, tmp_path
):
    """r16, the NEW window: members landed, the guard-id insert
    didn't. The replay's probe fully verifies the doc against its own
    committed fingerprint, so the epoch is exactly-once with the
    sidecar row (documented-benign) absent — the probe guards the id
    while its fingerprint is live. Pins the subtlest claim in the
    sidecar design: a reorder of the inserts, or a probe change that
    stops matching a doc's own fingerprint, would duplicate here."""
    _crash_replay_drill(spark, tmp_path, "crg", crash_after=2)


def test_cc_capstone_commit_crash_replay_exactly_once(spark, tmp_path):
    """The capstone stream shares fingerprint_probe_and_commit with a
    score-attaching transform — same exactly-once contract, and the
    transform's columns survive the replay overwrite."""
    from pyspark.sql import functions as F

    def attach(novel):
        return novel.withColumn("score", F.length("text").cast("double"))

    _crash_replay_drill(
        spark, tmp_path, "cr2", crash_after=0, transform=attach
    )
    # the drill's seed partition predates the transform column
    # (bootstrap_cc_corpus writes the full scored schema in real use);
    # mergeSchema surfaces the stream partitions' score here
    docs = spark.read.option("mergeSchema", "true").parquet(
        f"{tmp_path}/cr2_docs"
    )
    row = docs.where("doc_id = 11").collect()[0]
    assert row["score"] == float(len(row["text"]))


def test_cc_corpus_maintenance_job(spark, tmp_path):
    """VERDICT r15 #4 — the streaming capstone's corpus-GLOBAL other
    half: stream shards through cc_ingest, then run
    maintenance.maintain_cc_corpus and assert (a) the maintained docs
    equal the batch recomputation (span removal → decontamination →
    redact → frozen-LM score → fixed-tercile bucket) over the same
    accumulated corpus, (b) the fingerprint index is refreshed to the
    POST-span text, (c) the stream resumes from its checkpoint after
    maintenance with dedup catches and appends intact. Fixture
    distances pre-verified: planted cross-doc pairs all ≥17 hamming at
    max_hamming=3; the 27-token shared span is the only ≥20-token
    repeat (keep-first keeps doc 10's copy, doc 20 loses 27 tokens);
    the benchmark quotes doc 11 verbatim (contamination 1.0 ≥ 0.5)."""
    from pyspark.sql import functions as F

    from logrange_spark.ops import dedup
    from logrange_spark.ops import text as T
    from logrange_spark.streaming.cc_ingest import (
        _bucket_col,
        bootstrap_cc_corpus,
        start_cc_ingest_stream,
    )
    from logrange_spark.streaming.maintenance import maintain_cc_corpus

    name, root = "ccm", str(tmp_path)
    for t in ("fps", "fp_members", "fp_ids"):
        spark.sql(f"DROP TABLE IF EXISTS {name}_{t}")

    SPAN = (
        "the shared span tokens alpha beta gamma delta epsilon zeta eta"
        " must repeat.\n"
        "the same span continues theta iota kappa lambda mu nu xi"
        " across documents."
    )
    filler_b = [
        "the second document starts from a different angle on lakehouse"
        " manifests now.",
        "the second document proceeds to cover clustering ordering"
        " statistics pruning vectors.",
        "the second document ends by discussing snapshot compaction"
        " ordering statistics.",
    ]
    doc_a = "\n".join([
        "the first document opens with a unique preamble about spark"
        " engines today.",
        SPAN,
        "the first document closes with its own distinct shuffle"
        " partition epilogue.",
    ])
    doc_b = "\n".join(filler_b[:1] + [SPAN] + filler_b[1:])
    doc_c = "\n".join([
        "the contaminated document quotes benchmark material about"
        " syslog forwarders here.",
        "the quoted benchmark rows describe collectors parsers offsets"
        " journals chunks fully.",
        "the benchmark overlap must push this document over the"
        " contamination threshold.",
    ])
    seed1 = "\n".join([
        "the seed corpus begins with a calm note about registries"
        " oracles twins hashes.",
        "the seed corpus explains rotations retirements coverage"
        " inventories in detail.",
        "the seed corpus finishes with medians ratios budgets heaps"
        " sweeps artifacts.",
    ])
    seed2 = "\n".join([
        "the other seed document tells a story about watermarks follow"
        " tails pipes workers.",
        "the other seed document continues with cursors positions and"
        " stream triggers.",
        "the other seed document stops after describing catalyst"
        " tungsten joins windows.",
    ])
    gop = {"min_words": 8, "min_stopword_hits": 1,
           "max_symbol_word_ratio": 1.0}
    seed = spark.createDataFrame(
        [(1, seed1), (2, seed2)], "doc_id long, text string"
    )
    bootstrap_cc_corpus(
        spark, seed, name, f"{root}/{name}", ["casino"], gopher_kw=gop,
        max_hamming=3, n_buckets=8, min_docs=2, min_doc_frac=0.5,
    )

    inp = f"{root}/incoming"
    os.makedirs(inp, exist_ok=True)

    def corpus_ids():
        try:
            return sorted(
                r["doc_id"]
                for r in spark.read.parquet(
                    f"{root}/{name}_docs"
                ).select("doc_id").collect()
            )
        except Exception:
            return []

    def start():
        return start_cc_ingest_stream(
            spark, inp, name, f"{root}/{name}", f"{root}/ckpt",
            "doc_id long, text string", ["casino"], gopher_kw=gop,
            max_hamming=3,
        )

    def wait_for(ids, q):
        deadline = time.time() + 180
        while corpus_ids() != ids and time.time() < deadline:
            time.sleep(0.5)
            if q.exception():
                break
        assert q.exception() is None, q.exception()
        assert corpus_ids() == ids, corpus_ids()

    q = start()
    try:
        spark.createDataFrame(
            [(10, doc_a), (11, doc_c)], "doc_id long, text string"
        ).coalesce(1).write.mode("append").parquet(inp)
        wait_for([1, 2, 10, 11], q)
        spark.createDataFrame(
            [(20, doc_b)], "doc_id long, text string"
        ).coalesce(1).write.mode("append").parquet(inp)
        wait_for([1, 2, 10, 11, 20], q)
    finally:
        q.stop()

    # ---- batch twin over the SAME accumulated corpus ------------------
    pre = (
        spark.read.parquet(f"{root}/{name}_docs")
        .select("doc_id", "text")
        .localCheckpoint()  # pin: the maintenance below rewrites the files
    )
    bench = spark.createDataFrame([(99, doc_c)], "doc_id long, text string")
    spanned = dedup.remove_repeated_spans(pre, with_tokens=True)
    cont = T.contamination(spanned, bench, n=8, tokens_col="tokens")
    kept = spanned.join(
        cont.where(F.col("contamination") < 0.5).select("doc_id"), "doc_id"
    ).select("doc_id", "text")
    vocab = spark.read.parquet(f"{root}/{name}_vocab")
    t1, t2 = spark.read.parquet(
        f"{root}/{name}_thresholds"
    ).collect()[0]["_thr"]
    red = T.redact(kept)
    twin = (
        kept.join(
            T.unigram_lm_score(red, "doc_id", "redacted", vocab=vocab)
            .select("doc_id", "ppl"),
            "doc_id",
        )
        .join(red.select("doc_id", "n_emails"), "doc_id")
        .select("doc_id", "text", "n_emails", "ppl", _bucket_col(t1, t2))
    )
    expect = {r["doc_id"]: r for r in twin.collect()}
    # structure sanity on the twin itself: 11 decontaminated away, 20
    # lost its span copy, 10 kept it
    assert sorted(expect) == [1, 2, 10, 20]
    assert "alpha beta gamma" in expect[10]["text"]
    assert "alpha beta gamma" not in expect[20]["text"]

    report = maintain_cc_corpus(
        spark, name, f"{root}/{name}", benchmark=bench,
        max_hamming=3, n_buckets=8,
    )
    assert report["docs_before"] == 5 and report["docs_after"] == 4
    assert report["rescored"] and report["decontaminated"]

    got = {
        r["doc_id"]: r
        for r in spark.read.parquet(f"{root}/{name}_docs")
        .select("doc_id", "text", "n_emails", "ppl", "bucket")
        .collect()
    }
    assert sorted(got) == sorted(expect)
    for i, row in expect.items():
        for c in ("text", "n_emails", "ppl", "bucket"):
            assert got[i][c] == row[c], (i, c, got[i][c], row[c])

    # ---- the index is refreshed to the POST-span text ----------------
    h_expr, _ = dedup._hamming_masked_and_bands(F.col("simhash"), 64, 3)
    want_live = {
        (r["h"], r["doc_id"])
        for r in dedup.simhash(twin.select("doc_id", "text"),
                               "doc_id", "text", bits=64)
        .select(h_expr.alias("h"), "doc_id")
        .collect()
    }
    # members holds LIVE fingerprints only (h-in-members ⟺ h-in-fps
    # unconditionally); maintenance-DROPPED ids persist as tombstone
    # rows in the id-bucketed {name}_fp_ids replay-guard sidecar
    # (r16 — a tombstone row in members would break the band-insert
    # dedup's membership equivalence)
    got_members = {
        (r["h"], r["doc_id"])
        for r in spark.table(f"{name}_fp_members").collect()
    }
    assert got_members == want_live
    guard_ids = {
        r["doc_id"] for r in spark.table(f"{name}_fp_ids").collect()
    }
    assert guard_ids == {r[1] for r in want_live} | {11}
    # doc 20's fingerprint CHANGED (its span is gone) — the old one must
    # not linger in the refreshed index
    old20 = dedup.simhash(
        spark.createDataFrame([(20, doc_b)], "doc_id long, text string"),
        "doc_id", "text", bits=64,
    ).select(h_expr.alias("h")).collect()[0]["h"]
    assert (old20, 20) not in got_members

    # ---- tombstones survive a SECOND maintenance pass -----------------
    # (r16 review: the rebuilt members table starts from live docs, so
    # without the durable {path}_tombstones carry-forward a later pass
    # would erase the first one's tombstones and a crash-replayed epoch
    # could resurrect the dropped doc)
    report2 = maintain_cc_corpus(
        spark, name, f"{root}/{name}", benchmark=bench,
        max_hamming=3, n_buckets=8,
    )
    assert report2["tombstones_total"] == 1
    assert 11 in {
        r["doc_id"] for r in spark.table(f"{name}_fp_ids").collect()
    }

    # ---- the stream resumes across maintenance -----------------------
    q = start()
    try:
        spark.createDataFrame(
            [
                # exact re-crawl of doc 10 (its fingerprint is
                # span-stable: maintenance kept its span copy, and the
                # rebuilt text tokenizes identically) — must be caught
                # by the REFRESHED index at hamming 0
                (30, doc_a),
                # crash-replay shape: the maintenance-DROPPED doc is
                # redelivered under its ORIGINAL id — the tombstone
                # member row must keep it out (r16 review: without it,
                # the replay guard would re-commit the contaminated
                # text)
                (11, doc_c),
                # genuinely novel
                (31, "\n".join([
                    "the entirely new page talks about approximate"
                    " nearest neighbor codebooks calmly.",
                    "the entirely new page mentions product quantization"
                    " lookup tables and probes.",
                    "the entirely new page wraps up with inverted lists"
                    " and residual distances.",
                ])),
            ],
            "doc_id long, text string",
        ).coalesce(1).write.mode("append").parquet(inp)
        wait_for([1, 2, 10, 20, 31], q)
    finally:
        q.stop()
        for t in ("fps", "fp_members", "fp_ids"):
            spark.sql(f"DROP TABLE IF EXISTS {name}_{t}")


def test_write_docs_batch_overwrite_semantics(spark, tmp_path):
    """The family-wide docs-commit primitive: same batch id REPLACES
    (replay), different batch ids coexist (normal progress), and the
    bootstrap partition (-1) lives alongside stream partitions in one
    readable tree."""
    from logrange_spark.streaming.corpus_dedup import (
        BOOTSTRAP_BATCH,
        reset_docs_dir,
        write_docs_batch,
    )

    path = f"{tmp_path}/wdb_docs"
    reset_docs_dir(spark, path)
    write_docs_batch(
        spark.createDataFrame([(1, "seed")], "doc_id long, text string"),
        path, BOOTSTRAP_BATCH,
    )
    write_docs_batch(
        spark.createDataFrame(
            [(10, "attempt-1"), (11, "attempt-1")],
            "doc_id long, text string",
        ),
        path, 7,
    )
    # replay of epoch 7 with the (deterministically) recomputed batch:
    # replaces, never appends
    write_docs_batch(
        spark.createDataFrame(
            [(10, "attempt-2"), (11, "attempt-2")],
            "doc_id long, text string",
        ),
        path, 7,
    )
    write_docs_batch(
        spark.createDataFrame([(20, "next")], "doc_id long, text string"),
        path, 8,
    )
    rows = {
        r["doc_id"]: (r["text"], r["_batch"])
        for r in spark.read.parquet(path).collect()
    }
    assert rows == {
        1: ("seed", -1),
        10: ("attempt-2", 7),
        11: ("attempt-2", 7),
        20: ("next", 8),
    }
    # reset clears the whole tree for a re-bootstrap
    reset_docs_dir(spark, path)
    import os
    assert not os.path.exists(path)


def test_maintenance_heal_mid_swap(spark, tmp_path):
    """heal_cc_corpus finishes a maintenance run that crashed mid-swap:
    a missing ``_docs`` with ``.maint`` present completes the rename;
    a stale ``.maint`` beside a live ``_docs`` is pre-commit residue
    and is swept; a clean tree is a no-op."""
    import os

    from logrange_spark.streaming.corpus_dedup import (
        BOOTSTRAP_BATCH,
        write_docs_batch,
    )
    from logrange_spark.streaming.maintenance import heal_cc_corpus

    path = f"{tmp_path}/hl"
    df = spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "doc_id long, text string"
    )
    write_docs_batch(df, f"{path}_docs", BOOTSTRAP_BATCH)
    want = sorted(
        (r["doc_id"], r["text"])
        for r in spark.read.parquet(f"{path}_docs").collect()
    )

    # mid-swap crash: the old tree moved aside, the new one not yet
    # renamed in — _docs missing, .maint holds the maintained corpus
    os.rename(f"{path}_docs", f"{path}_docs.maint")
    assert heal_cc_corpus(spark, path) == "healed"
    got = sorted(
        (r["doc_id"], r["text"])
        for r in spark.read.parquet(f"{path}_docs").collect()
    )
    assert got == want
    assert not os.path.exists(f"{path}_docs.maint")

    # pre-commit residue: a crashed run left .maint beside a live tree
    os.makedirs(f"{path}_docs.maint")
    assert heal_cc_corpus(spark, path) == "residue-removed"
    assert not os.path.exists(f"{path}_docs.maint")

    # clean tree: no-op
    assert heal_cc_corpus(spark, path) == "clean"
    got = sorted(
        (r["doc_id"], r["text"])
        for r in spark.read.parquet(f"{path}_docs").collect()
    )
    assert got == want


def test_maintenance_on_unscored_fingerprint_corpus(spark, tmp_path):
    """maintain_cc_corpus over a PLAIN fingerprint-dedup corpus (no
    persisted vocab/thresholds — the generic corpus_dedup stream, not
    the capstone): span removal + decontamination run, the docs
    rewrite keeps the bare (id, text) schema (rescored=False), the
    index rebuilds from post-span text, and dropped ids tombstone."""
    from pyspark.sql import functions as F

    from logrange_spark.ops import dedup
    from logrange_spark.streaming.corpus_dedup import (
        bootstrap_fingerprint_corpus,
        fingerprint_probe_and_commit,
    )
    from logrange_spark.streaming.maintenance import maintain_cc_corpus

    name, root = "mgen", str(tmp_path)
    for t in ("fps", "fp_members", "fp_ids"):
        spark.sql(f"DROP TABLE IF EXISTS {name}_{t}")
    span = (
        "one repeated stretch of twenty or more tokens aa bb cc dd ee "
        "ff gg hh ii jj kk ll mm nn oo pp qq rr"
    )
    rows = [
        (1, "first doc distinct head words " + span),
        (2, "second doc other head tokens entirely " + span),
        (3, "third doc quoting the benchmark corpus verbatim here with "
            "plenty of unique overlap tokens to count"),
        (4, "fourth doc clean and unrelated content about parquet row "
            "groups and page indexes"),
    ]
    seed = spark.createDataFrame(rows[:1], "doc_id long, text string")
    bootstrap_fingerprint_corpus(
        spark, seed, name, f"{root}/{name}", max_hamming=3, n_buckets=8
    )
    fingerprint_probe_and_commit(
        spark,
        spark.createDataFrame(rows[1:], "doc_id long, text string"),
        name, f"{root}/{name}", max_hamming=3, batch_id=1,
    )
    assert sorted(
        r["doc_id"]
        for r in spark.read.parquet(f"{root}/{name}_docs").collect()
    ) == [1, 2, 3, 4]

    bench = spark.createDataFrame([(99, rows[2][1])],
                                  "doc_id long, text string")
    report = maintain_cc_corpus(
        spark, name, f"{root}/{name}", benchmark=bench,
        max_hamming=3, n_buckets=8,
    )
    assert report["rescored"] is False
    assert report["docs_before"] == 4 and report["docs_after"] == 3
    assert report["dropped_contaminated"] == 1

    docs = spark.read.parquet(f"{root}/{name}_docs")
    assert sorted(r["doc_id"] for r in docs.collect()) == [1, 2, 4]
    # bare schema: no score columns were invented
    assert set(docs.columns) == {"doc_id", "text", "_batch"}
    got = {r["doc_id"]: r["text"] for r in docs.collect()}
    # keep-first: doc 1 retains the span, doc 2 lost it
    assert "aa bb cc" in got[1] and "aa bb cc" not in got[2]
    # index: live fingerprints for 1/2/4; the tombstone for 3 lives in
    # the id-guard sidecar, never in members
    member_ids = sorted(
        r["doc_id"] for r in spark.table(f"{name}_fp_members").collect()
    )
    assert member_ids == [1, 2, 4]
    assert sorted(
        r["doc_id"] for r in spark.table(f"{name}_fp_ids").collect()
    ) == [1, 2, 3, 4]
    # replay shape: redelivering the dropped id leaves the corpus alone
    fingerprint_probe_and_commit(
        spark,
        spark.createDataFrame([rows[2]], "doc_id long, text string"),
        name, f"{root}/{name}", max_hamming=3, batch_id=2,
    )
    assert sorted(
        r["doc_id"]
        for r in spark.read.parquet(f"{root}/{name}_docs").collect()
    ) == [1, 2, 4]
    for t in ("fps", "fp_members", "fp_ids"):
        spark.sql(f"DROP TABLE IF EXISTS {name}_{t}")


def test_maintenance_preserves_caller_columns(spark, tmp_path):
    """maintain_cc_corpus over a corpus whose stream-side doc_schema
    carried columns BEYOND (id, text): the rewrite preserves them, with
    values intact for survivors and the input's column order (r16
    review — the first cut silently truncated such a corpus to bare
    (id, text))."""
    from logrange_spark.streaming.corpus_dedup import (
        bootstrap_fingerprint_corpus,
    )
    from logrange_spark.streaming.maintenance import maintain_cc_corpus

    name, root = "mcols", str(tmp_path)
    for t in ("fps", "fp_members", "fp_ids"):
        spark.sql(f"DROP TABLE IF EXISTS {name}_{t}")
    span = (
        "one repeated stretch of twenty or more tokens aa bb cc dd ee "
        "ff gg hh ii jj kk ll mm nn oo pp qq rr"
    )
    rows = [
        (1, "first doc distinct head words " + span, "http://a", 10),
        (2, "second doc other head tokens entirely " + span,
         "http://b", 20),
        (3, "third doc quoting the benchmark corpus verbatim here with "
            "plenty of unique overlap tokens to count", "http://c", 30),
    ]
    schema = "doc_id long, text string, url string, ts long"
    bootstrap_fingerprint_corpus(
        spark, spark.createDataFrame(rows, schema), name,
        f"{root}/{name}", max_hamming=3, n_buckets=8,
    )
    bench = spark.createDataFrame([(99, rows[2][1])],
                                  "doc_id long, text string")
    report = maintain_cc_corpus(
        spark, name, f"{root}/{name}", benchmark=bench,
        max_hamming=3, n_buckets=8,
    )
    assert report["rescored"] is False
    docs = spark.read.parquet(f"{root}/{name}_docs")
    # schema: caller columns survive, in the input order
    assert [c for c in docs.columns if c != "_batch"] == [
        "doc_id", "text", "url", "ts"
    ]
    got = {r["doc_id"]: r for r in docs.collect()}
    assert sorted(got) == [1, 2]  # doc 3 decontaminated away
    assert got[1]["url"] == "http://a" and got[1]["ts"] == 10
    assert got[2]["url"] == "http://b" and got[2]["ts"] == 20
    # the maintained TEXT still changed (keep-first span removal)
    assert "aa bb cc" in got[1]["text"]
    assert "aa bb cc" not in got[2]["text"]
    for t in ("fps", "fp_members", "fp_ids"):
        spark.sql(f"DROP TABLE IF EXISTS {name}_{t}")


def test_maintenance_refuses_scored_corpus_without_models(
    spark, tmp_path
):
    """A corpus carrying score columns (n_emails/ppl/bucket) whose
    frozen {path}_vocab/{path}_thresholds are ABSENT is refused with
    ValueError instead of silently rewritten without its score columns
    (r16 review — before, `rescored` quietly flipped to False and the
    attributes vanished)."""
    import pytest as _pytest

    from logrange_spark.streaming.corpus_dedup import (
        BOOTSTRAP_BATCH,
        write_docs_batch,
    )
    from logrange_spark.streaming.maintenance import maintain_cc_corpus

    name, root = "mrefuse", str(tmp_path)
    df = spark.createDataFrame(
        [(1, "alpha beta gamma", 0, 12.5, "head")],
        "doc_id long, text string, n_emails int, ppl double, "
        "bucket string",
    )
    write_docs_batch(df, f"{root}/{name}_docs", BOOTSTRAP_BATCH)
    with _pytest.raises(ValueError, match="frozen scoring state"):
        maintain_cc_corpus(spark, name, f"{root}/{name}")
    # and the refusal happened BEFORE any destructive step
    assert spark.read.parquet(f"{root}/{name}_docs").count() == 1


def test_maintenance_rerun_after_members_rebuild_crash(spark, tmp_path):
    """A crash inside persist_corpus_fingerprints' members rebuild (the
    persist_bucketed DROP → saveAsTable window) loses the members
    table; the RERUN must complete and converge — the durable
    tombstones file committed before the rebuild carries every non-live
    member id (r16 review — before, the rerun threw AnalysisException
    at the members read, making the crash permanent)."""
    from logrange_spark.streaming.corpus_dedup import (
        bootstrap_fingerprint_corpus,
        fingerprint_probe_and_commit,
    )
    from logrange_spark.streaming.maintenance import maintain_cc_corpus

    name, root = "mcrash", str(tmp_path)
    for t in ("fps", "fp_members", "fp_ids"):
        spark.sql(f"DROP TABLE IF EXISTS {name}_{t}")
    rows = [
        (1, "first doc distinct head words entirely unrelated content"),
        (2, "second doc quoting the benchmark corpus verbatim here "
            "with plenty of unique overlap tokens to count"),
        (3, "third doc clean and unrelated content about parquet row "
            "groups and page indexes"),
    ]
    seed = spark.createDataFrame(rows, "doc_id long, text string")
    bootstrap_fingerprint_corpus(
        spark, seed, name, f"{root}/{name}", max_hamming=3, n_buckets=8
    )
    bench = spark.createDataFrame([(99, rows[1][1])],
                                  "doc_id long, text string")
    maintain_cc_corpus(
        spark, name, f"{root}/{name}", benchmark=bench,
        max_hamming=3, n_buckets=8,
    )
    # crash-state: the run's tombstones file is durable (written before
    # any table rebuild) but the members saveAsTable never completed
    spark.sql(f"DROP TABLE {name}_fp_members")

    report = maintain_cc_corpus(
        spark, name, f"{root}/{name}", benchmark=bench,
        max_hamming=3, n_buckets=8,
    )
    assert report["docs_after"] == 2
    # converged: live fingerprints for 1/3 in members; the tombstone
    # for 2 in the id-guard sidecar
    members = {
        r["doc_id"]: r["h"]
        for r in spark.table(f"{name}_fp_members").collect()
    }
    assert sorted(members) == [1, 3]
    assert members[1] is not None and members[3] is not None
    assert sorted(
        r["doc_id"] for r in spark.table(f"{name}_fp_ids").collect()
    ) == [1, 2, 3]
    # and the tombstone still suppresses a replay of the dropped id
    fingerprint_probe_and_commit(
        spark,
        spark.createDataFrame([rows[1]], "doc_id long, text string"),
        name, f"{root}/{name}", max_hamming=3, batch_id=7,
    )
    assert sorted(
        r["doc_id"]
        for r in spark.read.parquet(f"{root}/{name}_docs").collect()
    ) == [1, 3]
    # second crash flavor: the GUARD SIDECAR saveAsTable never
    # completed — the rerun must converge identically (the durable
    # tombstones file carries the non-live ids)
    spark.sql(f"DROP TABLE {name}_fp_ids")
    maintain_cc_corpus(
        spark, name, f"{root}/{name}", benchmark=bench,
        max_hamming=3, n_buckets=8,
    )
    assert sorted(
        r["doc_id"] for r in spark.table(f"{name}_fp_ids").collect()
    ) == [1, 2, 3]
    fingerprint_probe_and_commit(
        spark,
        spark.createDataFrame([rows[1]], "doc_id long, text string"),
        name, f"{root}/{name}", max_hamming=3, batch_id=8,
    )
    assert sorted(
        r["doc_id"]
        for r in spark.read.parquet(f"{root}/{name}_docs").collect()
    ) == [1, 3]
    for t in ("fps", "fp_members", "fp_ids"):
        spark.sql(f"DROP TABLE IF EXISTS {name}_{t}")


def test_maintenance_tombstones_partially_committed_doc(spark, tmp_path):
    """r16 review: an epoch that crashed BEFORE any index insert
    leaves its doc in ``{path}_docs`` but in neither members nor the
    guard sidecar. Maintenance dropping that doc must STILL tombstone
    it — the derivation reads the pre-maintenance docs table (which
    holds every committed doc from its epoch's first write), not the
    index tables — or the replayed epoch resurrects the dropped
    text."""
    from logrange_spark.streaming.corpus_dedup import (
        bootstrap_fingerprint_corpus,
        fingerprint_probe_and_commit,
        write_docs_batch,
    )
    from logrange_spark.streaming.maintenance import maintain_cc_corpus

    name, root = "mpartial", str(tmp_path)
    for t in ("fps", "fp_members", "fp_ids"):
        spark.sql(f"DROP TABLE IF EXISTS {name}_{t}")
    contaminated = (
        "second doc quoting the benchmark corpus verbatim here with "
        "plenty of unique overlap tokens to count"
    )
    seed = spark.createDataFrame(
        [(1, "first doc distinct head words entirely unrelated stuff")],
        "doc_id long, text string",
    )
    bootstrap_fingerprint_corpus(
        spark, seed, name, f"{root}/{name}", max_hamming=3, n_buckets=8
    )
    # crash residue: doc 2's epoch wrote its docs partition, then died
    # before ANY index insert
    write_docs_batch(
        spark.createDataFrame([(2, contaminated)],
                              "doc_id long, text string"),
        f"{root}/{name}_docs", 5,
    )
    assert spark.table(f"{name}_fp_members").where(
        "doc_id = 2").count() == 0
    assert spark.table(f"{name}_fp_ids").where("doc_id = 2").count() == 0

    bench = spark.createDataFrame([(99, contaminated)],
                                  "doc_id long, text string")
    report = maintain_cc_corpus(
        spark, name, f"{root}/{name}", benchmark=bench,
        max_hamming=3, n_buckets=8,
    )
    assert report["docs_after"] == 1
    # the partially-committed doc was dropped AND tombstoned
    assert spark.table(f"{name}_fp_ids").where("doc_id = 2").count() == 1
    # the crashed epoch replays: the tombstone keeps the dropped text
    # out (no fingerprint survives for it, so only the id guard can)
    fingerprint_probe_and_commit(
        spark,
        spark.createDataFrame([(2, contaminated)],
                              "doc_id long, text string"),
        name, f"{root}/{name}", max_hamming=3, batch_id=5,
    )
    assert sorted(
        r["doc_id"]
        for r in spark.read.parquet(f"{root}/{name}_docs").collect()
    ) == [1]
    for t in ("fps", "fp_members", "fp_ids"):
        spark.sql(f"DROP TABLE IF EXISTS {name}_{t}")
