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


def test_paragraph_span_dedup_invariants(spark):
    """Span-level dedup: per-doc counts partition (kept + dropped =
    total), every distinct span hash is kept exactly once corpus-wide,
    and the winner rule is deterministic across runs."""
    from active_query_optimizer_spark.catalog import load_for_compute
    from active_query_optimizer_spark.functions import texttools as tt
    from active_query_optimizer_spark.operators.dedup import SPAN_W

    rows = QUERIES["dedup_paragraph_spans"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r["n_kept"] + r["n_dup_spans"] == r["n_spans"]
        # n_kept == 0 is legitimate: a fully-duplicated document owns no
        # first-seen span — that drop decision is the operator's point
    # total kept == number of distinct span hashes in the corpus
    d = load_for_compute(spark, SF_SMALL, "documents", "doc_id")
    th = tt.token_hashes(tt.tokens(F.col("text")))
    n_distinct = (d.select(th.alias("th"))
                  .select(F.posexplode(
                      F.transform(
                          F.sequence(
                              F.lit(0),
                              (F.floor((F.size("th") + (SPAN_W - 1))
                                       / SPAN_W)).cast("int") - 1),
                          lambda s: F.aggregate(
                              F.slice("th", s * SPAN_W + 1, F.lit(SPAN_W)),
                              F.lit(0).cast("long"),
                              lambda a, h: (a * 31 + h) % tt.HASH_P)))
                      .alias("i", "h"))
                  .select("h").distinct().count())
    assert sum(r["n_kept"] for r in rows) == n_distinct
    again = {(r["doc_id"], r["n_kept"])
             for r in QUERIES["dedup_paragraph_spans"](spark,
                                                       SF_SMALL).collect()}
    assert {(r["doc_id"], r["n_kept"]) for r in rows} == again


def test_chunk_overlap_counts_and_maponly_plan(spark):
    """Sliding-window chunking: chunk count matches the closed form per
    doc, the final chunk is the only short one, full chunks carry exactly
    CHUNK_C tokens — and the plan has NO exchange (map-only explode)."""
    from active_query_optimizer_spark.catalog import load_table
    from active_query_optimizer_spark.functions import texttools as tt
    from active_query_optimizer_spark.operators.curation import (
        CHUNK_C, CHUNK_S)

    df = QUERIES["text_chunk_overlap"](spark, SF_SMALL)
    rows = df.collect()
    n_tok = {r["doc_id"]: r["n"] for r in
             load_table(spark, SF_SMALL, "documents")
             .select("doc_id",
                     F.size(tt.tokens(F.col("text"))).alias("n"))
             .collect()}
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(n_tok)
    for doc_id, chunks in by_doc.items():
        n = n_tok[doc_id]
        expect_k = 1 + max(0, -(-(n - CHUNK_C) // CHUNK_S)) if n > CHUNK_C \
            else 1
        assert len(chunks) == expect_k, (doc_id, n, len(chunks))
        chunks.sort(key=lambda r: r["chunk_id"])
        for r in chunks[:-1]:
            assert r["n_chunk_tokens"] == CHUNK_C
        assert chunks[-1]["n_chunk_tokens"] == n - (expect_k - 1) * CHUNK_S
    # map-only AFTER the load: the single Exchange is load_for_compute's
    # deliberate input spread (REPARTITION_BY_NUM), never an algorithmic
    # hash shuffle from an agg/join — the explode itself moves nothing
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    for line in final.splitlines():
        if "Exchange" in line:
            assert "REPARTITION_BY_NUM" in line, plan


def test_temperature_mixture_flattens_distribution(spark):
    """Alpha=0.5 temperature sampling must FLATTEN the language mix: the
    kept-count ratio between the largest and smallest language is no
    larger than the corpus ratio, kept counts stay within each stratum,
    and the keep rule tracks the integer target within rounding slack."""
    from active_query_optimizer_spark.catalog import load_table
    from active_query_optimizer_spark.operators.curation import MIX_MOD

    rows = QUERIES["sample_temperature_mixture"](spark, SF_SMALL).collect()
    assert rows
    kept: dict[str, int] = {}
    for r in rows:
        kept[r["lang"]] = kept.get(r["lang"], 0) + 1
    corpus = {r["lang"]: r["n"] for r in
              load_table(spark, SF_SMALL, "documents")
              .groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(kept) <= set(corpus)
    for lang, k in kept.items():
        assert k <= corpus[lang]
    # flattening: kept share of the dominant language must not exceed its
    # corpus share (sqrt weighting only ever shrinks the top)
    big = max(corpus, key=corpus.get)
    assert kept[big] / sum(kept.values()) <= \
        corpus[big] / sum(corpus.values()) + 1e-9
    # expected keep fraction per lang ~ keep_lt/MOD of the stratum
    lt = {r["lang"]: r["keep_lt"] for r in rows}
    for lang, k in kept.items():
        expect = corpus[lang] * lt[lang] / MIX_MOD
        assert abs(k - expect) <= max(10, 0.35 * expect), (
            lang, k, expect)
    again = {(r["doc_id"], r["lang"]) for r in
             QUERIES["sample_temperature_mixture"](spark,
                                                   SF_SMALL).collect()}
    assert {(r["doc_id"], r["lang"]) for r in rows} == again


def test_paragraph_rewrite_roundtrip_and_consistency(spark):
    """Rewrite semantics: a document with no duplicated span round-trips
    to its space-joined tokens; every rewritten doc's token count equals
    len(split(new_text)); and the rewrite agrees with the profiling
    operator's kept-span accounting doc by doc."""
    from active_query_optimizer_spark.catalog import load_table
    from active_query_optimizer_spark.functions import texttools as tt

    rewrite = {r["doc_id"]: r for r in
               QUERIES["dedup_paragraph_rewrite"](spark, SF_SMALL).collect()}
    profile = {r["doc_id"]: r for r in
               QUERIES["dedup_paragraph_spans"](spark, SF_SMALL).collect()}
    toks = {r["doc_id"]: r["t"] for r in
            load_table(spark, SF_SMALL, "documents")
            .select("doc_id", tt.tokens(F.col("text")).alias("t"))
            .collect()}
    assert set(rewrite) == set(toks)
    dropped_docs = 0
    for doc_id, r in rewrite.items():
        out_toks = [t for t in r["new_text"].split(" ") if t]
        assert len(out_toks) == r["n_tokens_out"]
        p = profile.get(doc_id)
        if p is None:       # no spans => empty doc
            assert r["n_tokens_out"] == 0
            continue
        if p["n_dup_spans"] == 0:
            assert r["new_text"] == " ".join(toks[doc_id]), doc_id
        else:
            dropped_docs += 1
            assert r["n_tokens_out"] < len(toks[doc_id])
        if p["n_kept"] == 0:
            assert r["new_text"] == ""
    assert dropped_docs > 0  # the corpus genuinely contains repeated spans
