"""Curation-operator properties (oracle parity itself is covered by the
registry sweep in test_relational): semantic invariants + the plan shapes
the 100 TB story depends on."""

from __future__ import annotations

from pyspark.sql import functions as F

from active_query_optimizer_spark.operators import QUERIES
from active_query_optimizer_spark.operators.curation import (
    DECONTAM_MIN_SHARED, LANG_SAMPLE_CAP, PACK_TOKEN_BUDGET)

from .conftest import SF_SMALL


def test_decontam_flags_and_broadcast_plan(spark):
    df = QUERIES["decontam_ngram_overlap"](spark, SF_SMALL)
    rows = df.collect()
    assert rows
    # flag is exactly the threshold predicate, and benchmark docs are absent
    from active_query_optimizer_spark.operators.curation import \
        DECONTAM_BENCH_MOD
    for r in rows:
        assert r["contaminated"] == (r["n_shared"] >= DECONTAM_MIN_SHARED)
        assert r["doc_id"] % DECONTAM_BENCH_MOD != 0
    # the bounded benchmark side must broadcast (corpus never shuffles)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_pack_sequences_budget_invariants(spark):
    out = {(r["source"], r["seq_id"]): (r["n_docs"], r["seq_tokens"])
           for r in QUERIES["pack_sequences_budget"](spark, SF_SMALL).collect()}
    assert out
    for (source, seq_id), (n_docs, seq_tokens) in out.items():
        assert n_docs >= 1
        assert seq_id >= 0
    # per-source seq_ids start at 0 and increase with bounded gaps — NOT
    # necessarily contiguous: a document longer than the budget spans
    # several bins, so the next doc's first token can skip up to
    # ceil(max_doc_tokens/budget) bins (a 600-token doc under budget 256
    # maps its successor to seq 2 with no seq 1)
    from active_query_optimizer_spark.catalog import load_table
    from active_query_optimizer_spark.functions import texttools as tt
    from active_query_optimizer_spark.operators.curation import (
        PACK_TOKEN_BUDGET)

    max_tok = (load_table(spark, SF_SMALL, "documents")
               .select(F.max(F.size(tt.tokens(F.col("text")))).alias("m"))
               .collect()[0]["m"])
    max_gap = -(-max_tok // PACK_TOKEN_BUDGET)  # ceil
    by_source: dict[str, list[int]] = {}
    for (source, seq_id) in out:
        by_source.setdefault(source, []).append(seq_id)
    for source, ids in by_source.items():
        ids = sorted(ids)
        assert ids[0] == 0, (source, ids[:5])
        assert all(0 < b - a <= max_gap for a, b in zip(ids, ids[1:])), (
            source, max_gap)
    # token conservation: bins partition the corpus's tokens
    total = (load_table(spark, SF_SMALL, "documents")
             .select(F.sum(F.size(tt.tokens(F.col("text")))).alias("t"))
             .collect()[0]["t"])
    assert sum(t for _, t in out.values()) == total
    # single-exchange plan: the groupBy reuses the window's partitioning
    df = QUERIES["pack_sequences_budget"](spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_sample_balanced_per_lang_quota(spark):
    rows = QUERIES["sample_balanced_per_lang"](spark, SF_SMALL).collect()
    assert rows
    per_lang: dict[str, int] = {}
    for r in rows:
        per_lang[r["lang"]] = per_lang.get(r["lang"], 0) + 1
    assert all(n <= LANG_SAMPLE_CAP for n in per_lang.values()), per_lang
    # determinism: two runs pick the identical sample
    again = {(r["doc_id"], r["lang"])
             for r in QUERIES["sample_balanced_per_lang"](spark, SF_SMALL).collect()}
    assert {(r["doc_id"], r["lang"]) for r in rows} == again


def test_decontam_substring_planted_contamination(spark, tmp_path):
    """Planted-contamination check for the exact-containment rule: a doc
    carrying an eval string VERBATIM is flagged; docs sharing all the
    words without the contiguous string are not; the eval doc itself is
    never flagged (registry-sweep parity covers the DuckDB oracle)."""
    from active_query_optimizer_spark.operators.curation import \
        DECONTAM_BENCH_MOD as M

    evaltxt = "the quick brown fox jumps over the lazy dog benchmark item"
    rows = [
        (0 * M, evaltxt, "en", "eval", len(evaltxt)),            # bench doc
        (1, "prefix words then " + evaltxt + " and a suffix",
         "en", "src0", 0),                                       # planted
        (2, "dog lazy the over jumps fox brown quick the item benchmark",
         "en", "src0", 0),                                       # words only
        (3, "completely unrelated content about query optimizers",
         "en", "src1", 0),                                       # clean
        (2 * M, "another eval document that nothing contains verbatim",
         "en", "eval", 0),                                       # bench doc
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, "
              "n_chars bigint")
    sf = str(tmp_path / "sf_planted")
    df.coalesce(1).write.parquet(sf + "/documents.parquet")

    got = {(r["doc_id"], r["n_eval_hits"])
           for r in QUERIES["decontam_substring_containment"](
               spark, sf).collect()}
    assert got == {(1, 1)}


def test_decontam_substring_subsumes_exact_duplicates(spark):
    """On the real corpus, every corpus doc whose text EQUALS a bench
    doc's text must be containment-flagged (equality is containment) —
    ties the new rule to the exact-dedup ground truth."""
    from active_query_optimizer_spark.catalog import load_table
    from active_query_optimizer_spark.operators.curation import \
        DECONTAM_BENCH_MOD as M

    d = load_table(spark, SF_SMALL, "documents")
    bench = d.filter(F.col("doc_id") % M == 0).select(
        F.col("text").alias("bt"))
    equal_dups = {r["doc_id"] for r in
                  d.filter(F.col("doc_id") % M != 0)
                   .join(bench, F.col("text") == F.col("bt"), "left_semi")
                   .collect()}
    flagged = {r["doc_id"] for r in QUERIES[
        "decontam_substring_containment"](spark, SF_SMALL).collect()}
    assert equal_dups <= flagged
