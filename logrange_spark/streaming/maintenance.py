"""Periodic corpus-GLOBAL maintenance over a streamed corpus — the
batch other-half of the streaming capstone (VERDICT r15 #4).

The continuous streams (streaming/cc_ingest.py, corpus_dedup.py) run
every PER-DOCUMENT and PER-SHARD stage online, but two of the batch
capstone's passes are corpus-global by definition and deliberately stay
out of the per-shard loop (cc_ingest.py module docstring): cross-document
repeated-span removal (Lee et al. ACL'22 — a span repeated across shards
is invisible inside any one micro-batch) and benchmark decontamination
(the contamination fraction is a property of the final text). This job
runs them PERIODICALLY over the accumulated ``{path}_docs``:

    read {path}_docs ─► tokenize ONCE ─► repeated-span removal
    ─► benchmark decontamination (drop ≥ contam_max)
    ─► re-score against the PERSISTED bounded models, if present
       ({path}_vocab / {path}_thresholds — the stream's frozen CCNet
       state; the maintained text changed, so its ppl/bucket must too)
    ─► rewrite {path}_docs ATOMICALLY (tmp build + rename commit point)
    ─► refresh the fingerprint index from the post-span text

Offline contract (same as shard.rebalance_shards): the stream must be
STOPPED while this runs — the job rewrites the docs tree and the index
tables the stream's foreachBatch reads. Restart the stream afterwards;
its checkpoint is untouched. Replay stays idempotent across a
maintenance run because the rebuilt ``{name}_fp_ids`` replay-guard
sidecar preserves EVERY pre-maintenance doc id: live docs re-enter it
(and re-fingerprint into members/fps from their post-span text), and
maintenance-DROPPED ids (contaminated, fully-redundant) persist as
TOMBSTONE rows in the sidecar — without them, a crash-replayed epoch
would re-commit a dropped document with its original unmaintained
text (r16 review). Tombstones live ONLY in the id sidecar, never in
members: members holds live fingerprints alone, so the
h-in-members ⟺ h-in-fps equivalence the stream's band-insert dedup
rests on holds unconditionally, and the guard acts purely through the
bucketed id anti-join. The accumulated id set is durable in
``{path}_tombstones`` (tmp+rename before each table rebuild), so
reruns and LATER maintenance passes carry every prior tombstone
forward. A tombstone suppresses only the SAME id; a re-crawl of
removed content under a new id is admitted by design (the stream has
no decontamination stage — the next maintenance pass re-drops it).

Crash-rerunnable: the maintained corpus is fully materialized under
``{path}_docs.maint`` before any destructive step; the single rename of
``.maint`` onto ``{path}_docs`` is the commit point (the old tree moves
aside first and is deleted last). A rerun from any crash state
completes: a leftover ``.maint`` with ``_docs`` present is a pre-commit
residue and is rebuilt; a missing ``_docs`` with ``.maint`` present is a
mid-swap crash and the swap is finished before anything else. The index
refresh runs LAST, from the committed on-disk docs, so rerunning the job
always converges index to docs — including a crash INSIDE the index
rebuild itself (the persist_bucketed DROP → saveAsTable window can lose
any of the index tables; the rerun tolerates their absence because the
durable tombstones file, committed strictly before any table rebuild,
already carries every non-live guarded id).

Schema contract: the rewritten ``{path}_docs`` keeps the INPUT schema —
caller-supplied columns beyond (id, text) ride through by id-join, the
score columns (n_emails, ppl, bucket) are recomputed from the frozen
models when present, and a scored corpus whose frozen state is missing
is REFUSED (ValueError) rather than silently rewritten without its
score columns.

reference: the reference splits per-record pipes from store-wide
maintenance jobs the same way (pkg/partition/partition.go:408-490 —
truncate/sync run over the whole store while writers are idle); this is
that split for the curation corpus.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, functions as F

from ..ops import dedup, text
from .cc_ingest import _bucket_col
from .corpus_dedup import (
    BOOTSTRAP_BATCH,
    fs_delete,
    fs_exists,
    fs_rename,
    write_docs_batch,
)

# the per-doc attributes the capstone stream derives from its frozen
# models (cc_ingest.bootstrap_cc_corpus) — recomputed here when the
# models are present, refused (never silently dropped) when they are not
_SCORE_COLS = ("n_emails", "ppl", "bucket")


def maintain_cc_corpus(
    spark,
    name: str,
    path: str,
    benchmark: DataFrame | None = None,
    contam_max: float = 0.5,
    ngram: int = 8,
    min_len: int = dedup.SPAN_MIN_LEN,
    max_hamming: int = 3,
    n_buckets: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict:
    """Run the corpus-global maintenance pass over ``{path}_docs`` and
    return a report dict. ``benchmark`` is the eval set to
    decontaminate against (rows with a ``text_col`` column); ``None``
    skips the decontamination stage (span removal still runs).
    ``max_hamming``/``n_buckets`` must match the values the index was
    bootstrapped with — the probe recomputes bands from them.

    The stage order is the BATCH capstone's (__spark_entry__._cc_stages:
    span removal → decontamination → redact → LM score → bucket), and
    the scoring state is the STREAM's (frozen ``{path}_vocab`` /
    ``{path}_thresholds``), so after maintenance the docs table equals
    the batch recomputation of the streaming semantics over the
    accumulated corpus — the e2e equality tests/test_stateful.py pins.
    """
    t0 = time.time()
    healed = heal_cc_corpus(spark, path)  # finish any crashed prior run
    base_full = spark.read.parquet(f"{path}_docs")
    # the output schema is the INPUT schema: every column the stream
    # persisted next to (id, text) — a caller doc_schema's url/lang/ts —
    # rides through maintenance by id-join; only text (span removal) and
    # the frozen-model score columns (recomputed below) change. Without
    # this, maintaining a generic-stream corpus silently truncated it to
    # bare (id, text) (r16 review).
    score_cols = [c for c in _SCORE_COLS if c in base_full.columns]
    extra_cols = [
        c for c in base_full.columns
        if c not in (id_col, text_col, "_batch") and c not in _SCORE_COLS
    ]
    base = base_full.select(id_col, text_col)
    n_before = base.count()
    # pin the PRE-maintenance id set now (eager — the atomic rewrite
    # below deletes the files this plan reads): it is the tombstone
    # derivation's source of truth. Every committed document is in the
    # docs table from its epoch's FIRST write, so deriving drops from
    # it covers even a doc whose epoch crashed before any index insert
    # (in docs, in neither members nor the sidecar) — deriving from the
    # index tables missed exactly that window (r16 review).
    pre_ids = base_full.select(id_col).localCheckpoint(eager=True)

    # tokenize ONCE (the r15 capstone contract): span removal and the
    # contamination n-grams consume the same spread token stream
    toked = dedup.spread(
        base.selectExpr(id_col, f"{text.tokens_sql(text_col)} AS _tok")
    )
    spanned = (
        dedup.remove_repeated_spans(
            base, id_col, text_col, min_len, toked=toked, with_tokens=True
        )
        # a document whose ENTIRE text was a duplicate span is fully
        # redundant content — drop it, keeping the corpus 1:1 with the
        # fingerprint index (simhash has no fingerprint for an empty
        # token stream, so such rows would be unprobeable ghosts)
        .where(F.size("tokens") > 0)
        .localCheckpoint(eager=False)
    )
    n_spanned = spanned.count()
    report: dict = {
        "docs_before": n_before,
        "dropped_empty_after_spans": n_before - n_spanned,
        "heal": healed,
    }

    if benchmark is not None:
        cont = text.contamination(
            spanned, benchmark, n=ngram, id_col=id_col,
            text_col=text_col, bench_text_col=text_col,
            tokens_col="tokens",
        )
        keep_ids = cont.where(
            F.col("contamination") < contam_max
        ).select(id_col)
        maintained = spanned.hint("merge").join(keep_ids, id_col)
    else:
        maintained = spanned
    maintained = maintained.select(id_col, text_col)
    if extra_cols:
        # corpus-scaled on both sides — merge, never broadcast
        maintained = maintained.join(
            base_full.select(id_col, *extra_cols).hint("merge"), id_col
        )

    # re-score against the stream's frozen bounded models, if this is a
    # scored (capstone) corpus — the maintained text changed, so the
    # persisted per-doc attributes must be recomputed the same way the
    # stream computes them (redact → unigram LM → fixed tercile cuts)
    rescored = fs_exists(spark, f"{path}_vocab") and fs_exists(
        spark, f"{path}_thresholds"
    )
    if score_cols and not rescored:
        # the corpus carries scored attributes but the frozen state that
        # produced them is gone — rewriting without them would silently
        # DESTROY the score columns (and a later stream restart would
        # fail on the narrowed schema). Fail loud; the operator either
        # restores {path}_vocab/{path}_thresholds or drops the columns
        # deliberately (r16 review).
        raise ValueError(
            f"{path}_docs carries score columns {score_cols} but "
            f"{path}_vocab/{path}_thresholds are missing; refusing to "
            "rewrite the corpus without its frozen scoring state"
        )
    if rescored:
        vocab = spark.read.parquet(f"{path}_vocab")
        t1, t2 = spark.read.parquet(
            f"{path}_thresholds"
        ).collect()[0]["_thr"]
        red = text.redact(maintained, id_col, text_col)
        # both attribute joins are corpus-scaled on BOTH sides — merge,
        # never broadcast (the r13 audit rule; an estimate-driven
        # broadcast of a per-doc score frame dies at 100 TB)
        maintained = (
            maintained.join(
                text.unigram_lm_score(
                    red, id_col, "redacted", vocab=vocab
                ).select(id_col, "ppl").hint("merge"),
                id_col,
            )
            .join(red.select(id_col, "n_emails").hint("merge"), id_col)
            .select(
                id_col, text_col, *extra_cols, "n_emails", "ppl",
                _bucket_col(t1, t2),
            )
        )
    # output column ORDER is the input's (so stream appends after
    # maintenance keep one stable parquet schema across batches)
    out_cols = [c for c in base_full.columns if c != "_batch"]
    if rescored:
        out_cols += [c for c in _SCORE_COLS if c not in out_cols]
    maintained = maintained.select(*out_cols)
    report["rescored"] = rescored

    # ---- atomic rewrite ----------------------------------------------
    # (heal_cc_corpus above already finished a mid-swap crash and swept
    # pre-commit .maint residue, so both staging paths start clear)
    maint, old = f"{path}_docs.maint", f"{path}_docs.old"
    write_docs_batch(maintained, maint, BOOTSTRAP_BATCH)  # materialize
    n_after = spark.read.parquet(maint).count()
    fs_delete(spark, old)
    fs_rename(spark, f"{path}_docs", old)
    fs_rename(spark, maint, f"{path}_docs")  # commit point
    fs_delete(spark, old)

    # ---- tombstones (durable), then index refresh ---------------------
    # TOMBSTONES: every id ever dropped by maintenance stays a row in
    # the {name}_fp_ids replay-guard sidecar, so a crash-replayed
    # stream epoch cannot re-commit a dropped document (the per-batch
    # guard anti-joins the sidecar by its bucket key). Two
    # review-driven invariants (r16):
    # - tombstones live ONLY in the id sidecar, never in members: a
    #   members row without matching fps band rows breaks the
    #   h-in-members ⟺ h-in-fps equivalence novel_band_rows' dedup
    #   rests on — a later-admitted doc sharing that h would silently
    #   skip its band insert and become unprobeable forever. With the
    #   sidecar carrying the guard, members holds live fingerprints
    #   alone and the equivalence is unconditional.
    # - the id set is DURABLE across reruns and later passes: the
    #   rebuilt tables start from live docs only, and each run
    #   re-derives only its own drops, so without a carried-forward
    #   record a second pass would erase the first one's tombstones.
    #   The accumulated set persists in {path}_tombstones (tmp+rename,
    #   written BEFORE the table rebuild), each run unioning the file,
    #   the pre-rebuild members + sidecar ids and its own drops minus
    #   the live set — any crash point replays to the same set.
    final = spark.read.parquet(f"{path}_docs").select(id_col, text_col)
    final_ids = final.select(id_col)
    tomb_path = f"{path}_tombstones"
    # tombstone sources: the PRE-maintenance docs ids (pinned above)
    # and the durable file — deliberately NOT the index tables. The
    # docs table holds every committed document from its epoch's first
    # write, so pre_ids covers every stream crash window uniformly —
    # including an epoch that died before ANY index insert, whose doc
    # is in docs but in neither members nor the sidecar (deriving from
    # the index tables let maintenance drop such a doc WITHOUT a
    # tombstone, and the replayed epoch then resurrected it; r16
    # review). The file carries every PRIOR pass's tombstones (ids no
    # longer in docs). Reading no index table here also makes the
    # rerun trivially immune to a crash inside
    # persist_corpus_fingerprints' rebuild (the persist_bucketed DROP →
    # saveAsTable window) losing one of them.
    tomb_ids = pre_ids
    if fs_exists(spark, tomb_path):
        tomb_ids = tomb_ids.unionByName(
            spark.read.parquet(tomb_path).select(id_col)
        )
    tomb_ids = (
        tomb_ids.join(final_ids, id_col, "left_anti")
        .distinct()
        .localCheckpoint(eager=True)  # pin before the table rebuild
    )
    tomb_ids.write.mode("overwrite").parquet(f"{tomb_path}.tmp")
    fs_delete(spark, tomb_path)
    fs_rename(spark, f"{tomb_path}.tmp", tomb_path)
    dedup.persist_corpus_fingerprints(
        spark, dedup.simhash(final, id_col, text_col, bits=64),
        name, path, id_col, "simhash", 64, max_hamming, n_buckets,
    )
    spark.read.parquet(tomb_path).select(
        F.col(id_col)
    ).write.insertInto(f"{name}_fp_ids")
    n_tomb = tomb_ids.count()
    report["tombstones_total"] = n_tomb

    report.update(
        {
            "docs_after": n_after,
            "dropped_contaminated": (
                n_spanned - n_after if benchmark is not None else 0
            ),
            "decontaminated": benchmark is not None,
            "wall_sec": round(time.time() - t0, 3),
        }
    )
    return report


def heal_cc_corpus(spark, path: str) -> str:
    """Finish a maintenance run that crashed mid-swap: if ``_docs`` is
    missing and ``.maint`` exists, complete the rename; return what was
    done ('healed', 'clean', or 'residue-removed'). Safe to call before
    opening the corpus read-only after an unclean maintenance stop."""
    maint, docs = f"{path}_docs.maint", f"{path}_docs"
    if not fs_exists(spark, docs) and fs_exists(spark, maint):
        fs_rename(spark, maint, docs)
        fs_delete(spark, f"{path}_docs.old")
        return "healed"
    if fs_exists(spark, maint):
        fs_delete(spark, maint)
        return "residue-removed"
    fs_delete(spark, f"{path}_docs.old")
    return "clean"
