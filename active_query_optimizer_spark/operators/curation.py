"""Training-data curation operators — the corpus-preparation steps a
large-scale LLM data pipeline runs between dedup and training, expressed
Spark-first with exact DuckDB oracles:

- **decontamination** (`decontam_ngram_overlap`): flag corpus documents
  whose character-5-gram shingles overlap a benchmark/eval set — the
  n-gram-overlap decontamination used for pretraining corpora (the same
  shingle primitive as `operators/dedup`, pointed at an eval suite instead
  of the corpus itself);
- **sequence packing** (`pack_sequences_budget`): assign documents to
  fixed token-budget training sequences with a per-source running token
  total — the streaming analog of example packing, one window scan, no
  shuffle beyond the source partitioning;
- **balanced sampling** (`sample_balanced_per_lang`): per-language quota
  sampling by deterministic pseudo-random rank — capping dominant
  languages without a global sort.

All three are pure JVM Column expressions (no UDFs); the curation
decisions (flags, bin ids, sample picks) are integers/booleans, so the
driver's value-hash is exact.

Scale notes are per-operator; the common theme is that each touches the
corpus once and shuffles only keys + small aggregates, never text bodies
(except the packing groupBy, which carries two longs per doc).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_for_compute
from ..functions import texttools as tt
from .registry import register

#: benchmark/eval split for decontamination: a deterministic thin slice of
#: doc ids stands in for the held-out eval suite
DECONTAM_BENCH_MOD = 97
#: shared-shingle count at which a document counts as contaminated
DECONTAM_MIN_SHARED = 3
#: n-gram width reused from the dedup family (5-grams discriminate;
#: see operators/dedup.py MINHASH_SHINGLE_N)
DECONTAM_SHINGLE_N = 5

#: token budget per packed training sequence
PACK_TOKEN_BUDGET = 256

#: per-language sample quota
LANG_SAMPLE_CAP = 40
#: multiplicative pseudo-random key (Lehmer/MINSTD multiplier); small
#: enough that doc_id * MULT stays far below int64 overflow at any SF —
#: overflow semantics differ between engines, so headroom is correctness
SAMPLE_MULT = 48271
SAMPLE_MOD = 65537


@register(
    "decontam_ngram_overlap",
    oracle=f"""
    WITH bench AS (
      SELECT DISTINCT unnest({tt.shingle_hashes_sql('text', DECONTAM_SHINGLE_N)}) AS g
      FROM documents WHERE doc_id % {DECONTAM_BENCH_MOD} = 0
    ),
    ex AS (
      SELECT DISTINCT doc_id,
             unnest({tt.shingle_hashes_sql('text', DECONTAM_SHINGLE_N)}) AS g
      FROM documents WHERE doc_id % {DECONTAM_BENCH_MOD} <> 0
    )
    SELECT e.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shared,
           COUNT(*) >= {DECONTAM_MIN_SHARED} AS contaminated
    FROM ex e JOIN bench b ON e.g = b.g
    GROUP BY e.doc_id
    """,
)
def decontam_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: count each corpus document's distinct
    5-gram shingles that also occur anywhere in the benchmark slice; flag
    docs at ``>= DECONTAM_MIN_SHARED`` shared shingles.

    Scale: a real benchmark shingle set (the eval suite) is bounded by
    construction, but THIS bench slice is ``doc_id % 97 == 0`` — ~1% of the
    corpus, which *grows with SF* — so no broadcast is forced: AQE sees the
    post-distinct size and picks broadcast while the side is small,
    degrading to a shuffle join instead of a driver OOM when it isn't
    (the same forced-broadcast-of-a-scaling-side trap removed from
    ``dedup_minhash_lsh`` in round 2). The groupBy payload stays one long
    per (doc, shared-shingle)."""
    d = load_for_compute(spark, sf_dir, "documents", "doc_id")
    sh = tt.shingle_hashes(F.col("text"), n=DECONTAM_SHINGLE_N)
    bench = (d.filter(F.col("doc_id") % DECONTAM_BENCH_MOD == 0)
             .select(F.explode(sh).alias("g")).distinct())
    corpus = (d.filter(F.col("doc_id") % DECONTAM_BENCH_MOD != 0)
              .select("doc_id", F.explode(sh).alias("g")))
    # shingle arrays are already distinct per doc (array_distinct in
    # texttools), so (doc_id, g) needs no extra dedup before counting
    return (corpus.join(bench, "g")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_shared"))
            .select("doc_id", "n_shared",
                    (F.col("n_shared") >= DECONTAM_MIN_SHARED)
                    .alias("contaminated")))


#: shingle width for substring-containment anchors: long enough that an
#: anchor is a discriminating phrase, and the minimum eval-string length
#: the containment rule covers (shorter eval strings have no 12-gram)
DECONTAM_SUB_SHINGLE_N = 12


@register(
    "decontam_substring_containment",
    oracle=f"""
    WITH bench AS (
      SELECT doc_id AS bench_id, text AS bench_text FROM documents
      WHERE doc_id % {DECONTAM_BENCH_MOD} = 0
        AND len(text) >= {DECONTAM_SUB_SHINGLE_N}
    ), anchors AS (
      SELECT bench_id, MIN(g) AS g FROM (
        SELECT bench_id,
               unnest({tt.shingle_hashes_sql('bench_text',
                                             DECONTAM_SUB_SHINGLE_N)}) AS g
        FROM bench
      ) GROUP BY bench_id
    ), corpus AS (
      SELECT doc_id, text FROM documents
      WHERE doc_id % {DECONTAM_BENCH_MOD} <> 0
    ), cand AS (
      SELECT cs.doc_id, a.bench_id FROM (
        SELECT doc_id,
               unnest({tt.shingle_hashes_sql('text',
                                             DECONTAM_SUB_SHINGLE_N)}) AS g
        FROM corpus
      ) cs JOIN anchors a USING (g)
    )
    SELECT c.doc_id,
           CAST(COUNT(DISTINCT c.bench_id) AS BIGINT) AS n_eval_hits
    FROM cand c
    JOIN corpus d ON c.doc_id = d.doc_id
    JOIN bench b ON c.bench_id = b.bench_id
    WHERE instr(d.text, b.bench_text) > 0
    GROUP BY c.doc_id
    """,
)
def decontam_substring_containment(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """Exact eval-string containment decontamination — the complement of
    the fraction-overlap rule: a corpus document is contaminated when a
    benchmark/eval string occurs VERBATIM inside it (the rule eval-suite
    owners publish for memorization screening), not merely when shingle
    sets overlap.

    Exact via inverted-index + verify: a doc containing eval string e
    necessarily contains every 12-char shingle of e, so each eval string
    contributes ONE anchor shingle (its min-hash shingle — any one works,
    min is deterministic) to an inverted index; corpus docs are probed by
    shingle join, and only the surviving (doc, eval) candidate pairs pay
    an exact ``instr`` verification. No false negatives (anchor
    containment is implied by string containment), no false positives
    (verify is exact). Eval strings shorter than the shingle width carry
    no anchor and are documented out of scope.

    Scale: the anchor index is one hash per eval string (eval suites are
    bounded — broadcast-sized in production; AQE decides here since THIS
    synthetic bench slice grows with SF). Text bodies move only for
    verified candidates — the corpus-wide work is the same shingle scan
    the overlap rule already does."""
    d = load_for_compute(spark, sf_dir, "documents", "doc_id")
    n = DECONTAM_SUB_SHINGLE_N
    bench = (d.filter((F.col("doc_id") % DECONTAM_BENCH_MOD == 0)
                      & (F.length("text") >= n))
             .select(F.col("doc_id").alias("bench_id"),
                     F.col("text").alias("bench_text")))
    anchors = bench.select(
        "bench_id",
        F.array_min(tt.shingle_hashes(F.col("bench_text"), n)).alias("g"))
    corpus = (d.filter(F.col("doc_id") % DECONTAM_BENCH_MOD != 0)
              .select("doc_id", "text"))
    cand = (corpus
            .select("doc_id", F.explode(
                tt.shingle_hashes(F.col("text"), n)).alias("g"))
            .join(anchors, "g")
            .select("doc_id", "bench_id"))
    return (cand.join(corpus, "doc_id").join(bench, "bench_id")
            .filter(F.expr("instr(text, bench_text) > 0"))
            .groupBy("doc_id")
            .agg(F.count_distinct("bench_id").alias("n_eval_hits")))


@register(
    "pack_sequences_budget",
    oracle=f"""
    WITH toks AS (
      SELECT source, doc_id,
             len({tt.tokens_sql('text')}) AS n_tok
      FROM documents
    ),
    binned AS (
      SELECT source, doc_id, n_tok,
             CAST(FLOOR(CAST(COALESCE(SUM(n_tok) OVER (
                 PARTITION BY source ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS DOUBLE) / {PACK_TOKEN_BUDGET}.0) AS BIGINT) AS seq_id
      FROM toks
    )
    SELECT source, seq_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS seq_tokens
    FROM binned GROUP BY source, seq_id
    """,
)
def pack_sequences_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming sequence packing: within each source (doc_id order), a
    document joins the training sequence where its first token lands —
    ``seq_id = floor(tokens_before / budget)``. Summary per packed
    sequence: document count and token total.

    Scale: ONE shuffle on source — loading repartitions by source so the
    window reuses that partitioning, and the groupBy reuses it again;
    per-row state is two longs. (Parallelism is bounded by distinct
    sources, inherent to per-source packing — a real pipeline's source key
    is fine-grained: shard files, crawl segments.) The greedy variant (reorder
    docs to minimize padding) is deliberately NOT this operator — it is
    sequential per partition and belongs in an applyInPandas like
    ``select/coreset.greedy_k_center`` if padding efficiency ever pays for
    the extra pass."""
    d = load_for_compute(spark, sf_dir, "documents", "source")
    n_tok = F.size(tt.tokens(F.col("text")))
    w = (Window.partitionBy("source").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    cum_before = F.coalesce(F.sum("n_tok").over(w), F.lit(0))
    seq_id = F.floor(cum_before.cast("double") / float(PACK_TOKEN_BUDGET))
    return (d.select("source", "doc_id", n_tok.alias("n_tok"))
            .withColumn("seq_id", seq_id.cast("bigint"))
            .groupBy("source", "seq_id")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_tok").cast("bigint").alias("seq_tokens")))


@register(
    "sample_balanced_per_lang",
    oracle=f"""
    SELECT doc_id, lang FROM (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY (doc_id * {SAMPLE_MULT}) % {SAMPLE_MOD}, doc_id
             ) AS rk
      FROM documents
    ) WHERE rk <= {LANG_SAMPLE_CAP}
    """,
)
def sample_balanced_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-balanced quota sample: at most ``LANG_SAMPLE_CAP`` docs per
    language, picked by a deterministic multiplicative pseudo-random rank
    (doc_id tie-break makes the pick total-ordered, hence reproducible
    across engines and partitionings).

    Scale: per-group top-k via rank-and-filter — one shuffle on lang; with
    heavy skew (one dominant language) the partial top-k per map partition
    (``F.min_by``-style pre-aggregation or AQE skew split) bounds any
    single reducer, and no text bodies move — only (doc_id, lang)."""
    d = load_for_compute(spark, sf_dir, "documents", "doc_id")
    pk = (F.col("doc_id") * SAMPLE_MULT) % SAMPLE_MOD
    w = Window.partitionBy("lang").orderBy(pk, "doc_id")
    return (d.select("doc_id", "lang")
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= LANG_SAMPLE_CAP)
            .select("doc_id", "lang"))


#: target mixture weights by source tier: sources src0-src4 are "high
#: quality" (weight 4), src5-src9 mid (2), the rest tail (1); the CASE on
#: the numeric suffix stands in for a curated domain->weight table
MIX_W_HIGH, MIX_W_MID, MIX_W_TAIL = 4, 2, 1
MIX_WSUM = 5 * MIX_W_HIGH + 5 * MIX_W_MID + 10 * MIX_W_TAIL
#: keep-decision granularity (prime, ~1e6 slots)
MIX_MOD = 999983

#: TRY_CAST on both engines: a source name with no numeric suffix parses
#: to NULL (→ tail weight) instead of erroring the whole job — DuckDB's
#: plain CAST('', INT) throws where Spark's cast yields NULL, so the
#: lenient form is also what keeps the two engines identical
_MIX_W_SQL = f"""CASE WHEN TRY_CAST(regexp_extract(source, '([0-9]+)$', 1)
                           AS INT) < 5 THEN {MIX_W_HIGH}
                      WHEN TRY_CAST(regexp_extract(source, '([0-9]+)$', 1)
                           AS INT) < 10 THEN {MIX_W_MID}
                      ELSE {MIX_W_TAIL} END"""


@register(
    "sample_weighted_mix",
    oracle=f"""
    WITH wsrc AS (
      SELECT source, COUNT(*) AS n_src, {_MIX_W_SQL} AS w
      FROM documents GROUP BY source
    ), feas AS (
      SELECT MIN(n_src * {MIX_WSUM} // w) AS t_total FROM wsrc
    ), rates AS (
      SELECT source,
             LEAST({MIX_MOD},
                   (w * t_total // {MIX_WSUM}) * {MIX_MOD} // n_src)
               AS keep_lt
      FROM wsrc, feas
    )
    SELECT d.doc_id, d.source, CAST(r.keep_lt AS BIGINT) AS keep_lt
    FROM documents d JOIN rates r USING (source)
    WHERE (d.doc_id * {SAMPLE_MULT} + 7) % {MIX_MOD} < r.keep_lt
    """,
)
def sample_weighted_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture sampling: thin each source toward a target mixture
    (weights by source tier) at the largest total size the corpus can
    supply — the "data mixing" step every pretraining pipeline runs to
    hit a target domain composition (e.g. up-weighting curated sources
    against crawl tail).

    The feasible total is ``min_s(n_s * W / w_s)`` (the binding source
    runs out first); each source then keeps ``~(w_s*T/W)/n_s`` of its
    rows via a deterministic Lehmer-hash Bernoulli — reproducible across
    engines/runs, unlike ``rand()`` sampling. All arithmetic is integer
    (engine-exact); `div`/`//` keeps division in the integer domain.

    Scale: per-source counts collapse map-side (one tiny shuffle); the
    global feasibility scalar and per-source rates are broadcast-sized by
    construction (one row per source); the keep decision is a map-only
    filter over the corpus — no row bodies ever shuffle."""
    d = load_for_compute(spark, sf_dir, "documents", "doc_id")
    idx = F.expr("try_cast(regexp_extract(source, '([0-9]+)$', 1) as int)")
    w = (F.when(idx < 5, MIX_W_HIGH).when(idx < 10, MIX_W_MID)
         .otherwise(MIX_W_TAIL))
    wsrc = (d.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_src"))
            .withColumn("w", w))
    feas = wsrc.select(
        F.min(F.expr(f"n_src * {MIX_WSUM} div w")).alias("t_total"))
    rates = (wsrc.crossJoin(F.broadcast(feas))
             .select("source", F.least(
                 F.lit(MIX_MOD),
                 F.expr(f"(w * t_total div {MIX_WSUM}) * {MIX_MOD}"
                        " div n_src")).alias("keep_lt")))
    return (d.join(F.broadcast(rates), "source")
            .filter((F.col("doc_id") * SAMPLE_MULT + 7) % MIX_MOD
                    < F.col("keep_lt"))
            .select("doc_id", "source",
                    F.col("keep_lt").cast("bigint").alias("keep_lt")))


@register(
    "sample_stratified_proportional",
    oracle=f"""
    SELECT doc_id, source FROM (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY (doc_id * {SAMPLE_MULT}) % {SAMPLE_MOD}, doc_id
             ) AS rk,
             CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS cnt
      FROM documents
    ) WHERE rk * 10 <= cnt + 9
    """,
)
def sample_stratified_proportional(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """PROPORTIONAL stratified sampling: a ⌈10%⌉ slice of every source,
    quota derived from the stratum's own size — the complement of
    ``sample_balanced_per_lang``'s fixed cap (that one EQUALIZES strata;
    this one PRESERVES the mixture, the standard held-out-split recipe
    when the eval set must mirror the corpus composition). Selection is
    the same deterministic Lehmer rank, so the sample is reproducible
    under any partitioning; the ceiling quota guarantees ≥1 doc from
    every stratum. The quota bar is cross-multiplied to integers
    (``rk*10 <= cnt+9`` ⇔ rk ≤ ⌈cnt/10⌉) — no division on either
    engine.

    Scale: rank and stratum count come from the SAME window partition —
    one exchange on `source`, no quota side-table join. A stratum too
    big for one partition's sort takes the threshold route instead:
    pick the k-th smallest hash per stratum from the harvester's
    percentile sketch and filter ``pseudokey <= threshold`` map-only;
    this entry is that route's exact anchor."""
    d = load_for_compute(spark, sf_dir, "documents", "doc_id")
    pk = (F.col("doc_id") * SAMPLE_MULT) % SAMPLE_MOD
    w = Window.partitionBy("source")
    wo = w.orderBy(pk.asc(), F.col("doc_id").asc())
    return (d.select("doc_id", "source")
            .withColumn("rk", F.row_number().over(wo))
            .withColumn("cnt", F.count(F.lit(1)).over(w).cast("bigint"))
            .where(F.col("rk") * 10 <= F.col("cnt") + 9)
            .select("doc_id", "source"))


#: GK accuracy for the sketch-threshold sampling route (rank error ≤ n/ACC)
STRAT_SKETCH_ACC = 10_000


@register("sample_stratified_sketch")  # rows-only: the GK threshold is an
# engine-specific in-bound element; set-overlap and quota-error bounds vs
# the exact anchor plus the no-Sort/no-Window plan shape are pinned in tests
def sample_stratified_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRODUCTION stratified ~10% sample — the threshold route the exact
    ``sample_stratified_proportional`` anchor promises: instead of a
    per-stratum SORT (row_number over the Lehmer pseudokey), pass 1
    computes each stratum's 10th-percentile pseudokey with
    ``percentile_approx`` (one grouped sketch aggregate — only mergeable
    GK summaries shuffle, rank error ≤ n/``STRAT_SKETCH_ACC``), and pass
    2 broadcasts the per-source threshold frame (bounded by the source
    domain) and keeps ``pk <= threshold`` MAP-ONLY.

    A stratum too large for one partition's sort is exactly where the
    anchor's window breaks down at 100 TB; this path never materializes
    a stratum in one place. Selection stays deterministic and
    reproducible under any partitioning (same Lehmer pseudokey as the
    anchor); the kept set differs from the anchor's only at the
    threshold boundary (GK rank error + pseudokey ties — the anchor
    tie-breaks by doc_id, the threshold keeps whole tie classes).

    Reference anchor: the harvester's range/percentile lane
    (``pg.py:87-162``) — the sketch this route reuses is the same one
    the optimizer statistics harvest ships."""
    d = load_for_compute(spark, sf_dir, "documents", "doc_id")
    pk = ((F.col("doc_id") * SAMPLE_MULT) % SAMPLE_MOD).cast("long")
    v = d.select("doc_id", "source", pk.alias("pk"))
    thr = (v.groupBy("source")
           .agg(F.percentile_approx("pk", F.lit(0.1),
                                    F.lit(STRAT_SKETCH_ACC)).alias("thr"),
                F.count(F.lit(1)).alias("n_stratum")))
    return (v.join(F.broadcast(thr), "source")
            .filter(F.col("pk") <= F.col("thr"))
            .select("doc_id", "source", F.col("n_stratum").cast("bigint")
                    .alias("n_stratum")))


# ---------------------------------------------------------------------------
# Context-window chunking (sliding token windows with overlap)
# ---------------------------------------------------------------------------

#: chunk width (tokens) and stride: 50% overlap, the standard sliding
#: context-window recipe for long-document pretraining / retrieval indexing
CHUNK_C = 32
CHUNK_S = 16


def _chunk_oracle() -> str:
    c, s = CHUNK_C, CHUNK_S
    k = f"(1 + (greatest(len(th) - {c}, 0) + {s - 1}) // {s})"
    fold = (f"list_reduce(list_prepend(0::BIGINT, th[s*{s}+1 : s*{s}+{c}]), "
            f"(acc, h) -> (acc * 31 + h) % {tt.HASH_P})")
    return f"""
    WITH th AS (
      SELECT doc_id, {tt.token_hashes_sql(tt.tokens_sql('text'))} AS th
      FROM documents
    )
    SELECT doc_id,
           unnest(range(0, {k})) AS chunk_id,
           unnest([least({c}, len(th) - s*{s}) for s in range(0, {k})])
             AS n_chunk_tokens,
           unnest([{fold} for s in range(0, {k})]) AS chunk_hash
    FROM th
    """


@register("text_chunk_overlap", oracle=_chunk_oracle())
def text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-context-window chunking: split every document into
    ``CHUNK_C``-token windows advancing by ``CHUNK_S`` (50% overlap) — the
    example-construction step between curation and training (and the unit
    of retrieval indexing). Emits one row per (doc, chunk) with the
    chunk's token count and a fold hash of its token-hash slice, so the
    expansion is oracle-checkable without moving text.

    Chunk count is ``1 + ceil(max(n-C, 0)/S)`` in pure integer arithmetic
    (the final partial window is kept — training consumers pad it); a
    document shorter than one window yields exactly its own single chunk.

    Scale: map-only — tokenize, fold each window, explode; no shuffle at
    all (the output inherits the scan partitioning). The overlap factor
    C/S bounds output rows at ~2x the token count regardless of document
    skew, and chunk hashes are computed from the already-materialized
    token-hash array (each token hashed once, not once per window)."""
    c, s = CHUNK_C, CHUNK_S
    d = load_for_compute(spark, sf_dir, "documents", "doc_id")
    th = tt.token_hashes(tt.tokens(F.col("text")))
    d = d.select("doc_id", th.alias("th"))
    n = F.size("th")
    k = (F.lit(1)
         + F.floor((F.greatest(n - c, F.lit(0)) + (s - 1)) / s)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), k - 1),
        lambda i: F.struct(
            F.least(F.lit(c), n - i * s).alias("n_chunk_tokens"),
            F.aggregate(
                F.slice("th", i * s + 1, F.lit(c)),
                F.lit(0).cast("long"),
                lambda acc, h: (acc * 31 + h) % tt.HASH_P)
            .alias("chunk_hash")))
    return (d.select("doc_id", F.posexplode(chunks).alias("chunk_id", "ch"))
            .select("doc_id", F.col("chunk_id").cast("bigint"),
                    F.col("ch.n_chunk_tokens").cast("bigint")
                     .alias("n_chunk_tokens"),
                    F.col("ch.chunk_hash").alias("chunk_hash")))


# ---------------------------------------------------------------------------
# Temperature-scaled mixture sampling (multilingual alpha-sampling)
# ---------------------------------------------------------------------------

@register(
    "sample_temperature_mixture",
    oracle=f"""
    WITH wl AS (
      SELECT lang, COUNT(*) AS n_l,
             CAST(FLOOR(SQRT(CAST(COUNT(*) AS DOUBLE))) AS BIGINT) AS w
      FROM documents GROUP BY lang
    ), scal AS (
      SELECT CAST(SUM(w) AS BIGINT) AS wsum,
             CAST(MIN(n_l * (SELECT SUM(w) FROM wl) // w) AS BIGINT)
               AS t_total
      FROM wl
    ), rates AS (
      SELECT lang,
             LEAST({MIX_MOD},
                   (w * t_total // wsum) * {MIX_MOD} // n_l) AS keep_lt
      FROM wl, scal
    )
    SELECT d.doc_id, d.lang, CAST(r.keep_lt AS BIGINT) AS keep_lt
    FROM documents d JOIN rates r USING (lang)
    WHERE (d.doc_id * {SAMPLE_MULT} + 13) % {MIX_MOD} < r.keep_lt
    """,
)
def sample_temperature_mixture(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Temperature-scaled language mixture (alpha = 0.5): resampling
    weights DERIVED from the corpus itself — ``w_l = floor(sqrt(n_l))`` —
    so dominant languages are down-weighted and tail languages up-weighted
    toward ``p_l ∝ n_l^0.5``, the standard multilingual pretraining
    recipe. The complement of ``sample_weighted_mix``'s static tier table:
    same feasibility bound (``T = min_l n_l*W/w_l`` — the binding language
    runs out first) and the same deterministic Lehmer-hash Bernoulli keep
    rule, with the weights computed, not configured.

    ``floor(sqrt(n))`` is engine-exact: IEEE-754 requires sqrt correctly
    rounded, both engines evaluate it on the same integer-valued double,
    and floor collapses the shared result to the same integer. Every
    other step is integer arithmetic (``div``).

    Scale: one map-side-combined count per language (tiny shuffle), two
    broadcast-sized scalar frames (one row per language), then a map-only
    keep filter over the corpus — row bodies never shuffle."""
    d = load_for_compute(spark, sf_dir, "documents", "doc_id")
    wl = (d.groupBy("lang")
          .agg(F.count(F.lit(1)).alias("n_l"))
          .withColumn("w", F.floor(F.sqrt(F.col("n_l").cast("double")))
                           .cast("bigint")))
    wsum = wl.agg(F.sum("w").cast("bigint").alias("wsum"))
    feas = (wl.crossJoin(F.broadcast(wsum))
            .agg(F.min(F.expr("n_l * wsum div w")).cast("bigint")
                 .alias("t_total")))
    rates = (wl.crossJoin(F.broadcast(wsum)).crossJoin(F.broadcast(feas))
             .select("lang", F.least(
                 F.lit(MIX_MOD),
                 F.expr(f"(w * t_total div wsum) * {MIX_MOD} div n_l"))
                 .alias("keep_lt")))
    return (d.join(F.broadcast(rates), "lang")
            .filter((F.col("doc_id") * SAMPLE_MULT + 13) % MIX_MOD
                    < F.col("keep_lt"))
            .select("doc_id", "lang",
                    F.col("keep_lt").cast("bigint").alias("keep_lt")))
