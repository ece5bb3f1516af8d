"""End-to-end curation pipeline: the full tier composed as ONE lazy
DataFrame job over real docs — the "a user runs their whole pipeline
here" proof.

Chain: Gopher quality gate → C4-relined cleaning → cross-doc line
dedup → hash-classifier gate → leakage-safe split assignment →
sequence packing of the train split. Asserts row-accounting
invariants at every stage, end-to-end determinism, and that no stage
introduces a Python eval node.
"""

from __future__ import annotations

import pyspark.sql.functions as F

SF_DIR = "/root/testdata/sf0.001"


def _no_python_eval(df):
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_curation_pipeline_end_to_end(spark):
    from quickwit_spark.functions.gopher import gopher_rules
    from quickwit_spark.functions.linededup import dedup_lines
    from quickwit_spark.functions.packing import pack_sequences
    from quickwit_spark.functions.quality_clf import quality_classifier
    from quickwit_spark.functions.sampling import assign_splits
    from quickwit_spark.functions.webclean import c4_clean

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_in = docs.count()
    assert n_in == 500

    # 1. Gopher gate on a configured rule subset (the synthetic vocab
    #    contains only 'the' from the required-stopword list, so that
    #    one rule correctly rejects everything — a deployment picks
    #    the rules that fit its corpus)
    g = gopher_rules(docs, min_words=30)
    kept_ids = g.filter(
        "r_word_count = 1 AND r_mean_word_len = 1 AND r_alpha_words = 1 "
        "AND r_symbol_ratio = 1"
    ).select("doc_id")
    n_gopher = kept_ids.count()
    assert 0 < n_gopher <= n_in

    stage1 = docs.join(kept_ids, "doc_id")

    # 2. C4-style cleaning over sentence-relined text (the corpus has
    #    no punctuation, so the reline also terminates each synthetic
    #    sentence with '.' — every C4 line rule then runs for real)
    relined = stage1.withColumn(
        "text",
        F.regexp_replace(F.col("text"), r"((?:\S+\s+){9}\S+)\s", "$1.\n"),
    )
    cleaned = c4_clean(relined, min_words=3, min_kept_lines=1).filter(
        "kept = 1"
    )
    n_clean = cleaned.count()
    assert 0 < n_clean <= n_gopher

    # 3. cross-doc exact line dedup on the cleaned text
    deduped = dedup_lines(
        cleaned.select("doc_id", F.col("clean_text").alias("text"))
    )
    assert deduped.count() == n_clean  # per-doc op keeps every doc
    assert deduped.filter("n_removed > n_lines").count() == 0

    # 4. classifier gate (always-keep threshold: exercise the scoring)
    scored = quality_classifier(
        deduped.select("doc_id", F.col("new_text").alias("text")),
        threshold_num=-2000,
    )
    survivors = scored.filter("keep = 1")
    n_final = survivors.count()
    # docs fully emptied by dedup (all lines were boilerplate) are
    # correctly rejected by the n_tokens > 0 clause
    assert n_final == deduped.filter("new_text != ''").count()

    # 5. leakage-safe splits on the doc id (no domain col in this set)
    final_text = deduped.join(survivors.select("doc_id"), "doc_id")
    split = assign_splits(final_text, "doc_id", {"test": 0.2})
    counts = {r["split"]: r["n"] for r in
              split.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "test"}
    assert sum(counts.values()) == n_final

    # 6. pack the train split into 512-token training sequences
    train = split.filter("split = 'train'").select(
        "doc_id", F.col("new_text").alias("text")
    )
    packed = pack_sequences(train, capacity=512)
    toks = F.size(F.filter(F.split("text", r"\s+"), lambda t: t != ""))
    total_tokens = train.agg(F.sum(toks)).collect()[0][0]
    packed_tokens = packed.agg(F.sum("n_toks")).collect()[0][0]
    assert packed_tokens == total_tokens  # packing loses nothing

    # plan hygiene: every stage above is JVM-only
    for df in (g, cleaned, deduped, scored, split):
        _no_python_eval(df)

    # end-to-end determinism: re-running the whole chain gives the
    # same per-doc rewrite bytes
    a = sorted(
        (r["doc_id"], r["new_text"]) for r in final_text.collect()
    )
    b = sorted(
        (r["doc_id"], r["new_text"]) for r in final_text.collect()
    )
    assert a == b and len(a) == n_final
