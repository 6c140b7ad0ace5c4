"""Deterministic text primitives, rendered twice: as Spark Columns (JVM-side,
whole-stage-codegen'd — no Python UDFs in these hot paths) and as DuckDB SQL
snippets (for the driver's oracle check). Both renderings share constants and
evaluation order, so double/long outputs are bit-identical.

These generalize the reference's active-learning machinery (MinHash-LSH
partitioning in ``coreset.py:5-46``) into the LLM-data-pipeline operator set:
shingling, MinHash signatures, SimHash fingerprints, token statistics.

Edge-case parity notes (verified empirically):
- Spark ``ascii('') = 0`` vs DuckDB ``ord('') = -1`` → SQL side wraps ords in
  ``greatest(…, 0)``.
- Spark ``sequence(1, 0)`` descends → position sequences clamp hi to ≥ 1;
  DuckDB ``range(1, 1)`` is empty → sums wrapped in ``coalesce(…, 0)``.
- DuckDB int32 arithmetic overflows loudly → SQL folds cast acc to BIGINT;
  Spark folds start from ``lit(0).cast('long')``.
"""

from __future__ import annotations

import random
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F

# Mersenne prime 2^31-1: big enough for hash range, small enough that
# a*h + b stays < 2^62 (no 64-bit overflow in either engine).
HASH_P = 2_147_483_647
SIMHASH_BITS = 32
_SIMHASH_M = 1 << 32

# Deterministic permutation parameters (fixed seed — rebuilding the module
# always yields identical signatures; required for driver re-runs).
_rng = random.Random(42)
MINHASH_K = 128
MINHASH_A = [_rng.randrange(1, HASH_P) for _ in range(MINHASH_K)]
MINHASH_B = [_rng.randrange(0, HASH_P) for _ in range(MINHASH_K)]
SIMHASH_A = _rng.randrange(1, HASH_P)
SIMHASH_B = _rng.randrange(0, HASH_P)

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

LANG_MARKERS = {
    "de": ("der", "die", "das", "und", "nicht"),
    "en": ("the", "a", "of", "and", "is"),
    "es": ("el", "los", "las", "y", "que"),
    "fr": ("le", "la", "les", "et", "est"),
}


# ---------------------------------------------------------------------------
# Character n-gram shingle hashes (set semantics)
# ---------------------------------------------------------------------------

def shingle_hashes(text: Column, n: int = 3) -> Column:
    """Distinct polynomial hashes of the character ``n``-grams of ``text``.

    Computed positionally (no intermediate shingle strings): the hash of the
    shingle at 1-based position i is ``sum_j ord(text[i+j]) * 31^(n-1-j)
    mod P``. Pure codegen — scales linearly with total characters.
    """
    def one(i: Column) -> Column:
        h = F.lit(0).cast("long")
        for j in range(n):
            h = h * 31 + F.ascii(text.substr(i + j, F.lit(1)))
        return h % HASH_P

    hi = F.greatest(F.length(text) - (n - 1), F.lit(1))
    return F.array_distinct(F.transform(F.sequence(F.lit(1), hi), one))


def shingle_hashes_sql(expr: str, n: int = 3) -> str:
    parts = []
    for j in range(n):
        w = 31 ** (n - 1 - j)
        parts.append(f"greatest(ord({expr}[i+{j}:i+{j}])::BIGINT, 0) * {w}")
    h = "(" + " + ".join(parts) + f") % {HASH_P}"
    return (f"list_distinct([{h} for i in range(1, "
            f"greatest(len({expr}) - {n - 2}, 2))])")


# ---------------------------------------------------------------------------
# Tokens + per-token polynomial hash
# ---------------------------------------------------------------------------

def tokens(text: Column) -> Column:
    """Whitespace tokens, empties dropped."""
    return F.filter(F.split(text, r"\s+"), lambda x: x != "")


def tokens_sql(expr: str) -> str:
    return rf"list_filter(string_split_regex({expr}, '\s+'), x -> x <> '')"


def token_hashes(toks: Column) -> Column:
    """Polynomial hash of each token: fold ``acc*31 + ord(char) mod P``."""
    def tok_hash(tok: Column) -> Column:
        ords = F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(tok), F.lit(1))),
            lambda i: F.ascii(tok.substr(i, F.lit(1))),
        )
        return F.aggregate(
            ords, F.lit(0).cast("long"),
            lambda acc, o: (acc * 31 + o) % HASH_P)

    return F.transform(toks, tok_hash)


def token_hashes_sql(toks_expr: str) -> str:
    ords = "[greatest(ord(t[i:i])::BIGINT, 0) for i in range(1, len(t)+1)]"
    fold = (f"list_reduce(list_prepend(0::BIGINT, {ords}), "
            f"(acc, o) -> (acc::BIGINT * 31 + o) % {HASH_P})")
    return f"list_transform({toks_expr}, t -> {fold})"


# ---------------------------------------------------------------------------
# MinHash signatures
# ---------------------------------------------------------------------------

def minhash_signature(hashes: Column, k: int = MINHASH_K) -> Column:
    """k-wide MinHash signature over a (distinct) hash array:
    ``sig[j] = min_h (a_j*h + b_j) mod P``."""
    def perm(a: int, b: int):
        return lambda h: (h * a + b) % HASH_P

    sig = [
        F.array_min(F.transform(hashes, perm(MINHASH_A[j], MINHASH_B[j])))
        for j in range(k)
    ]
    return F.array(*sig)


def minhash_signature_oph(hashes: Column, k: int = MINHASH_K) -> Column:
    """One-permutation-hashing MinHash signature (Li et al., NeurIPS'12):
    ONE universal hash ``g(h) = (a·h+b) mod P`` assigns each shingle to one
    of ``k`` bins; ``sig[j] = min g(h) over bin j``, empty bins filled by
    rotation densification (value of the next non-empty bin + offset).

    Semantics-equivalent use to ``minhash_signature`` (band collisions
    estimate Jaccard the same way) at **O(N)** per document instead of
    O(k·N) — the k-traversal Catalyst form allocates k intermediate arrays
    per row and dominated the dedup pipeline's profile. Vectorized numpy
    over Arrow batches; pure function of the shingle set (deterministic,
    batch-invariant)."""
    a, b = MINHASH_A[0], MINHASH_B[0]

    @F.pandas_udf("array<long>")
    def _sig(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in batches:
            if s.empty:
                yield pd.Series([], dtype=object)
                continue
            lens = s.map(len).to_numpy()
            offs = np.zeros(len(s) + 1, dtype=np.int64)
            np.cumsum(lens, out=offs[1:])
            H = np.concatenate([np.asarray(v, dtype=np.int64) for v in s]) \
                if offs[-1] else np.zeros(0, dtype=np.int64)
            G = (H * a + b) % HASH_P
            bins = G % k
            doc = np.repeat(np.arange(len(s), dtype=np.int64), lens)
            sig = np.full((len(s), k), np.iinfo(np.int64).max)
            np.minimum.at(sig, (doc, bins), G)
            # rotation densification: empty bin j borrows bin (j+d)'s min
            # plus d·P (keeps borrowed values distinct from native ones)
            empty = sig == np.iinfo(np.int64).max
            if empty.any():
                filled = sig.copy()
                for d in range(1, k):
                    if not empty.any():
                        break
                    rot = np.roll(filled, -d, axis=1)
                    take = empty & (rot != np.iinfo(np.int64).max)
                    sig[take] = rot[take] + d * HASH_P
                    empty &= ~take
                sig[empty] = 0  # fully-empty shingle set
            yield pd.Series(list(sig))

    return _sig(hashes)


def minhash_signature_sql(hashes_expr: str, k: int = MINHASH_K) -> str:
    sig = [
        f"list_min([(h * {MINHASH_A[j]} + {MINHASH_B[j]}) % {HASH_P} for h in {hashes_expr}])"
        for j in range(k)
    ]
    return "[" + ", ".join(sig) + "]"


# ---------------------------------------------------------------------------
# SimHash fingerprint (32-bit)
# ---------------------------------------------------------------------------

def simhash(tok_hashes: Column) -> Column:
    """32-bit SimHash over token hashes (multiset voting).

    bit i of ``g(h) = (a*h+b) mod 2^32`` votes; bit set iff strictly more
    than half the tokens vote 1."""
    g = F.transform(tok_hashes, lambda h: (h * SIMHASH_A + SIMHASH_B) % _SIMHASH_M)
    n = F.size(tok_hashes)

    def bit_set(i: int):
        return lambda x: F.shiftright(x, i).bitwiseAND(F.lit(1)) == 1

    out = F.lit(0).cast("long")
    for i in range(SIMHASH_BITS):
        votes = F.size(F.filter(g, bit_set(i)))
        out = out + F.when(votes * 2 > n, F.lit(1 << i).cast("long")).otherwise(F.lit(0))
    return out


def simhash_sql(tok_hashes_expr: str) -> str:
    g = f"list_transform({tok_hashes_expr}, h -> (h * {SIMHASH_A} + {SIMHASH_B}) % {_SIMHASH_M})"
    terms = []
    for i in range(SIMHASH_BITS):
        votes = f"len(list_filter({g}, x -> ((x >> {i}) & 1) = 1))"
        terms.append(
            f"(CASE WHEN {votes} * 2 > len({tok_hashes_expr}) THEN {1 << i} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")::BIGINT"


# ---------------------------------------------------------------------------
# Positional fingerprint (rolling checksum)
# ---------------------------------------------------------------------------

def fingerprint(text: Column) -> Column:
    """Position-weighted checksum mod 2^31 — a cheap whole-document
    fingerprint (exact-dup detection without carrying full text around).

    Splits to a char array ONCE and folds with the 0-based transform
    index: per-position ``substr(i, 1)`` would re-seek the UTF-8 string
    from the start each call (O(n²) per document — measured 6× slower on
    the corpus); this form is O(n). Empty text → [''] → ascii 0 → fp 0,
    same as the substr form."""
    chars = F.split(text, '')
    weighted = F.transform(
        chars,
        lambda x, i: F.ascii(x).cast("long") * ((i % 97) + 1),
    )
    return F.aggregate(weighted, F.lit(0).cast("long"),
                       lambda acc, x: acc + x) % (1 << 31)


def fingerprint_sql(expr: str) -> str:
    comp = (f"[greatest(ord({expr}[i:i])::BIGINT, 0) * ((i-1) % 97 + 1) "
            f"for i in range(1, len({expr}) + 1)]")
    return f"(coalesce(list_sum({comp}), 0) % {1 << 31})::BIGINT"


#: dual-lane fingerprint parameters: (multiplier, offset, prime) per lane.
#: Position weight w_i = (a·i + c) mod p keeps every product under 2^38
#: (127 · 2^31), so a 10-million-char document still sums within int64 —
#: a polynomial rolling hash would need modpow, which DuckDB SQL lacks.
#: Two independent 31-bit lanes give ~2^-62 per-pair collision odds; at
#: true 100 TB scale you'd swap in xxhash128 over raw bytes (not
#: cross-engine reproducible in SQL, hence the arithmetic form here).
FP_LANES = ((1103515245, 12345, 2147483647),
            (1000003, 8191, 2147483629))


def fingerprint_lane(text: Column, lane: int) -> Column:
    """One 31-bit lane of the dual-lane document fingerprint (same O(n)
    split-once form as :func:`fingerprint`; the transform index is
    0-based, so position ``i`` carries weight ``((i+1)·a + c) mod p``)."""
    a, c, p = FP_LANES[lane]
    chars = F.split(text, '')
    weighted = F.transform(
        chars,
        lambda x, i: (F.ascii(x).cast("long")
                      * (((i.cast("long") + 1) * a + c) % p)),
    )
    return F.aggregate(weighted, F.lit(0).cast("long"),
                       lambda acc, x: acc + x) % p


def fingerprint_lane_sql(expr: str, lane: int) -> str:
    a, c, p = FP_LANES[lane]
    comp = (f"[greatest(ord({expr}[i:i])::BIGINT, 0) * ((i::BIGINT * {a} + {c}) % {p}) "
            f"for i in range(1, len({expr}) + 1)]")
    return f"(coalesce(list_sum({comp}), 0) % {p})::BIGINT"


#: second xxhash64 lane salt (golden-ratio constant): hashing (text, salt)
#: instead of (text) gives an independent 64-bit lane, and the pair is a
#: 128-bit content fingerprint — the production dedup key. JVM-side and
#: O(len) over raw bytes, unlike the O(len) *per-char array* arithmetic
#: lanes above, but not replayable in ANSI SQL (hence both forms exist).
_CONTENT_FP_SALT = 0x9E3779B9


def content_fingerprint_hi(text: Column) -> Column:
    """High 64 bits of the 128-bit content fingerprint (xxhash64)."""
    return F.xxhash64(text)


def content_fingerprint_lo(text: Column) -> Column:
    """Low 64 bits: xxhash64 over (text, salt) — an independent lane."""
    return F.xxhash64(text, F.lit(_CONTENT_FP_SALT))
