"""ccnet_pipeline language fan-out proof.

ops/text.ccnet_pipeline unions one kn_ngram_score sub-plan per language
(CCNet trains one LM per language; the paper's production run covers
~100 languages). Each sub-plan is a multi-join probe, so the UNION's
logical plan grows linearly in k and the analyzer could go superlinear.
This tool measures plan-build and execution wall at k in {5, 25, 50}
synthetic per-language bigram models over a fixed corpus, so SCALE.md
can state whether the per-language union survives realistic fan-out or
needs the lang-keyed-model-table restructure.

Usage: python tools/ccnet_fanout_proof.py [k ...]
Prints one JSON line per k: {"k", "t_models", "t_plan", "t_exec",
"rows"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402


def lang_vocab(j: int) -> list[str]:
    # disjoint 30-word vocabularies -> classifier separates cleanly
    return [f"w{j}_{i}" for i in range(30)]


def make_docs(spark, n_docs: int, k: int):
    rows = []
    for d in range(n_docs):
        j = d % k
        v = lang_vocab(j)
        words = [v[(d * 7 + i * 13) % len(v)] for i in range(40)]
        rows.append((d, f"l{j:02d}", " ".join(words)))
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def make_weights(spark, docs, k: int, n_features: int, ngram: int):
    """One-vs-rest weights that pick the right language: weight 1 on
    the hashed features of the language's own vocabulary, bias -0.5."""
    from logrange_spark.ops import text as T

    feats = T._classifier_features(
        docs.select("doc_id", "text"), "doc_id", "text", n_features, ngram
    )
    own = (
        docs.select("lang", "doc_id")
        .join(feats, "doc_id")
        .where(F.col("feature") >= 0)
        .select("lang", "feature")
        .distinct()
        .select("lang", "feature", F.lit(1.0).alias("weight"))
    )
    bias = spark.createDataFrame(
        [(f"l{j:02d}", -1, -0.5) for j in range(k)],
        "lang string, feature long, weight double",
    )
    return own.unionByName(bias).localCheckpoint(eager=True)


def run(spark, k: int, n_docs: int = 5000) -> dict:
    from logrange_spark.ops import text as T

    docs = make_docs(spark, n_docs, k).localCheckpoint(eager=True)
    nf, ng = 256, 2
    weights = make_weights(spark, docs, k, nf, ng)
    t0 = time.monotonic()
    models = {
        f"l{j:02d}": T.kn_ngram_lm(
            docs.where(F.col("lang") == f"l{j:02d}").select("text"),
            order=2,
        )
        for j in range(k)
    }
    t1 = time.monotonic()
    df = T.ccnet_pipeline(
        docs.select("doc_id", "text"),
        weights,
        models,
        n_features=nf,
        ngram=ng,
    )
    t2 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    t3 = time.monotonic()
    return {
        "k": k,
        "n_docs": n_docs,
        "t_models_sec": round(t1 - t0, 2),
        "t_plan_sec": round(t2 - t1, 2),
        "t_exec_sec": round(t3 - t2, 2),
    }


def main() -> None:
    from logrange_spark import build_session

    ks = [int(a) for a in sys.argv[1:]] or [5, 25, 50]
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")  # x100/sf0.1-scale entry point; library default is 8g
    spark = build_session(app_name="ccnet-fanout-proof")
    spark.sparkContext.setLogLevel("ERROR")
    for k in ks:
        print(json.dumps(run(spark, k)), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
