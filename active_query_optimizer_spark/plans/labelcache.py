"""Label cache for the optimizer-results pipeline (round-5 verdict #2).

Labeling is the artifact run's long pole: every candidate variant of every
generated query executes once at sf0.1 (~3h for 224 queries in round 5),
and growing the workload re-labeled everything from scratch. This module
makes growth incremental: a labeled bundle is persisted under a key of

    (sql text, strategy tuple, timeout, sf_dir, code fingerprint)

where the code fingerprint hashes the four modules whose behavior the
labels embed — ``plans/explore.py`` (variant construction, timing,
realized-plan capture), ``plans/featurize.py`` (plan serialization),
``session.py`` (the session confs execution runs under) and
``catalog.py`` (the view/load semantics every cached SQL executed
against — round-6 advice: a catalog change must not reuse stale labels).
Any edit to those files invalidates every cached label, so a stale label
can never survive an operator/labeling change; a workload-generator
change shows up in the SQL text itself. ``sf_dir`` is additionally keyed
by a DATA fingerprint (relative name + size + a head/tail content sample
of every parquet file under it), so regenerated data at the same path
relabels rather than silently reusing labels measured against different
rows. Deliberately mtime-free (round-8 advice): a fresh checkout or a
byte-identical regeneration keeps the committed cache valid — the
content sample (first+last 64 KiB, which covers the parquet footer
statistics any real regeneration perturbs) plus size is what detects
changed data. Both fingerprints are memoized per process; mid-run data
regeneration is out of contract (tests use ``cache_clear()``).

A ``ZombieExecutionError`` during labeling is recorded as a POISONED
marker (``{"poisoned": true, "attempts": n, "error": ...}``), not an
empty bundle: reruns retry the query up to ``MAX_POISON_ATTEMPTS`` times
(a transient machine condition should not exclude a query from every
future measurement round), and only a repeat offender is skipped
permanently. Legacy empty-list bundles written by the round-6 scheme are
read as poison markers with one attempt spent, so they too get a retry.

MEASUREMENT-PROTOCOL NOTE (the deliberate decision the round-5 verdict
asked for): with the cache on, a grown workload's totals mix measurement
sessions — queries labeled in different runs on the same machine. Labels
were already documented as single-run measurements on a shared machine
("treat small per-query deltas as noise"); the cache widens that to
cross-session noise in exchange for incremental growth. RESULTS.md
states when its labels were cache-mixed. Tests never use the cache
(``cache_dir=None`` default keeps the live pipeline pinned).

Storage: one gzipped JSON file per bundle under ``.label_cache/`` at the
repo root (committed — that is what makes the NEXT round's growth
incremental). Plans round-trip through the reference bundle JSON
(``to_pg_json``/``from_pg_json``); ``total_cost`` is not preserved, which
is fine for this pipeline — pairwise training consumes (plan, wall-ms)
only (cost pretraining labels its own corpus separately).
"""

from __future__ import annotations

import functools
import gzip
import hashlib
import json
import os
from typing import TYPE_CHECKING

from .explore import Candidate, label_query
from .featurize import from_pg_json, to_pg_json

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import SparkSession

#: modules whose source the labels' semantics depend on
_FINGERPRINT_FILES = ("plans/explore.py", "plans/featurize.py", "session.py",
                      "catalog.py")

#: a poisoned query is retried this many times across runs before it is
#: skipped for good (a zombie variant is usually a pathological plan, but
#: round-6 advice: it can also be a transient machine condition)
MAX_POISON_ATTEMPTS = 2


#: head/tail bytes sampled per parquet file for the data fingerprint —
#: the tail covers the parquet footer (row counts, column statistics,
#: encodings), which any real data regeneration perturbs
_SAMPLE_BYTES = 65536

#: interior sample points per file (round-9 advice: head+tail alone left
#: mid-file data pages of a multi-row-group file outside the sample — a
#: same-size regeneration differing only there reused stale labels).
#: 4 KiB at each of 8 evenly-spaced interior offsets closes that blind
#: spot at ~32 KiB extra read per file.
_MID_SAMPLES = 8
_MID_SAMPLE_BYTES = 4096


@functools.lru_cache(maxsize=1)
def code_fingerprint() -> str:
    """Hash of the labeling-relevant source files (see module docstring).
    Memoized: source files cannot change mid-run by design (round-8
    advice — ``bundle_key`` is called per query and re-reading four files
    each time was pure overhead)."""
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    h = hashlib.sha256()
    for rel in _FINGERPRINT_FILES:
        with open(os.path.join(pkg_root, rel), "rb") as fh:
            h.update(fh.read())
        h.update(b"\0")
    return h.hexdigest()[:16]


def _walk_parquet(root: str):
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            if f.endswith(".parquet"):
                yield os.path.join(dirpath, f)


def _fingerprint_entries(root: str, mid_samples: int) -> str:
    entries = []
    for full in _walk_parquet(root):
        st = os.stat(full)
        ch = hashlib.sha256()
        with open(full, "rb") as fh:
            ch.update(fh.read(_SAMPLE_BYTES))
            if mid_samples and st.st_size > 2 * _SAMPLE_BYTES:
                interior = st.st_size - 2 * _SAMPLE_BYTES
                for k in range(mid_samples):
                    off = _SAMPLE_BYTES + (interior * k) // mid_samples
                    fh.seek(off)
                    ch.update(fh.read(_MID_SAMPLE_BYTES))
            if st.st_size > 2 * _SAMPLE_BYTES:
                fh.seek(-_SAMPLE_BYTES, os.SEEK_END)
            ch.update(fh.read(_SAMPLE_BYTES))
        entries.append((os.path.relpath(full, root),
                        st.st_size, ch.hexdigest()[:16]))
    entries.sort()
    return hashlib.sha256(json.dumps(entries).encode()).hexdigest()[:16]


@functools.lru_cache(maxsize=None)
def data_fingerprint(sf_dir: str) -> str:
    """Hash of (relative path, size, head + 8 evenly-spaced interior
    samples + tail) for every parquet file under ``sf_dir``, recursively
    (partitioned tables are directories). Any data regeneration at the
    same path changes this and relabels; deliberately mtime-free so a
    committed cache survives fresh checkouts and byte-identical
    regenerations (round-8 advice). The interior samples close the
    round-9 blind spot (a same-size regeneration differing only in
    mid-file data pages). Memoized per (normalized) path: the dataset
    cannot change mid-run by design — tests that rewrite fixture data
    call ``cache_clear()``."""
    return _fingerprint_entries(os.path.normpath(sf_dir), _MID_SAMPLES)


@functools.lru_cache(maxsize=None)
def data_fingerprint_legacy_v1(sf_dir: str) -> str:
    """The pre-round-10 head+tail-only fingerprint. Kept ONLY so
    ``tools/rekey_label_cache.py`` can establish the provenance of
    bundles keyed under the old schema and migrate them to the current
    key for the SAME (sf_dir, timeout) configuration. Never used for new
    keys."""
    return _fingerprint_entries(os.path.normpath(sf_dir), 0)


def _key_from(sql: str, strategies: tuple[str, ...],
              timeout_s: float | None, sf_dir: str, data_fp: str,
              code_fp: str | None = None) -> str:
    payload = json.dumps(
        [sql, list(strategies), timeout_s, os.path.normpath(sf_dir),
         code_fp if code_fp is not None else code_fingerprint(), data_fp],
        sort_keys=True)
    return hashlib.sha256(payload.encode()).hexdigest()[:32]


def bundle_key(sql: str, strategies: tuple[str, ...],
               timeout_s: float | None, sf_dir: str) -> str:
    """Content key for one labeled bundle (includes the code fingerprint
    and the data fingerprint of ``sf_dir``)."""
    return _key_from(sql, strategies, timeout_s, sf_dir,
                     data_fingerprint(sf_dir))


def bundle_key_legacy_v1(sql: str, strategies: tuple[str, ...],
                         timeout_s: float | None, sf_dir: str) -> str:
    """The pre-round-10 key (head+tail-only data fingerprint) — see
    :func:`data_fingerprint_legacy_v1`; migration use only."""
    return _key_from(sql, strategies, timeout_s, sf_dir,
                     data_fingerprint_legacy_v1(sf_dir))


def bundle_key_at_code(sql: str, strategies: tuple[str, ...],
                       timeout_s: float | None, sf_dir: str,
                       code_fp: str) -> str:
    """``bundle_key`` under an EXPLICIT code fingerprint — migration use
    only (``tools/rekey_label_cache.py --legacy-code-rev``): when a
    fingerprinted source file changes in a way verified not to alter
    label semantics (e.g. a purely additive helper), the old fingerprint
    recomputed from git establishes each stored bundle's provenance
    exactly like the legacy data-fingerprint matchers do."""
    return _key_from(sql, strategies, timeout_s, sf_dir,
                     data_fingerprint(sf_dir), code_fp)


def code_fingerprint_of(sources: dict[str, bytes]) -> str:
    """The fingerprint that ``code_fingerprint`` would produce for the
    given ``{relpath: content}`` mapping of ``_FINGERPRINT_FILES`` —
    lets migration tooling recompute a historical fingerprint from
    ``git show REV:path`` blobs without checking the revision out."""
    h = hashlib.sha256()
    for rel in _FINGERPRINT_FILES:
        h.update(sources[rel])
        h.update(b"\0")
    return h.hexdigest()[:16]


def _encode(cands: list[Candidate]) -> list[dict]:
    return [{
        "variant": c.variant,
        "sql": c.sql,
        "fingerprint": c.fingerprint,
        "plan_json": to_pg_json(c.plan),
        "exec_time_ms": c.exec_time_ms,
        "conf": c.conf,
        "realized_joins": list(c.realized_joins),
        "hint_realized": c.hint_realized,
        "timed_out": c.timed_out,
    } for c in cands]


def _decode(rows: list[dict]) -> list[Candidate]:
    out = []
    for r in rows:
        plan, _ = from_pg_json(r["plan_json"])
        out.append(Candidate(
            variant=r["variant"], sql=r["sql"],
            fingerprint=r["fingerprint"], plan=plan,
            exec_time_ms=r["exec_time_ms"], conf=dict(r["conf"]),
            realized_joins=tuple(r["realized_joins"]),
            hint_realized=r["hint_realized"],
            # None on bundles cached before the flag existed (round 12)
            timed_out=r.get("timed_out")))
    return out


def _atomic_write(cache_dir: str, key: str, payload) -> None:
    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(cache_dir, f"{key}.json.gz")
    tmp = f"{path}.tmp.{os.getpid()}"
    with gzip.open(tmp, "wt") as fh:
        json.dump(payload, fh)
    os.replace(tmp, path)


def write_bundle(cache_dir: str, key: str, cands: list[Candidate]) -> None:
    """Persist one labeled bundle atomically (tmp + rename), so a killed
    run keeps every bundle it finished — the incremental-growth property.
    An empty/short list is a valid bundle: it marks a genuinely
    unrankable (plan-collapse) query so reruns skip it instantly. A
    POISONED query is different — record it with ``record_poisoned`` so
    it keeps a retry budget."""
    _atomic_write(cache_dir, key, _encode(cands))


def record_poisoned(cache_dir: str, key: str, error: str = "",
                    sql: str | None = None) -> int:
    """Mark ``key`` poisoned (a zombie variant survived cancellation),
    incrementing its cross-run attempt count; returns the new count.
    Reruns retry the query until ``MAX_POISON_ATTEMPTS`` is spent.
    ``sql`` (kept from the prior marker when the caller omits it) makes
    the marker re-keyable across verified-benign labeling-code changes,
    like ``record_probe``'s."""
    attempts = 1
    prior = read_bundle(cache_dir, key)
    if isinstance(prior, dict) and prior.get("poisoned"):
        attempts = int(prior.get("attempts", 1)) + 1
        if sql is None:
            sql = prior.get("sql")
    payload: dict = {"poisoned": True, "attempts": attempts, "error": error}
    if sql is not None:
        payload["sql"] = sql
    _atomic_write(cache_dir, key, payload)
    return attempts


def record_probe(cache_dir: str, key: str, probe_s: float,
                 passed: bool, ms: float | None = None,
                 sql: str | None = None) -> None:
    """Persist the default-variant probe outcome for ``key`` (round-10
    verdict #2 — de-saturating the scale rehearsal): a query whose
    DEFAULT plan cannot finish within ``probe_s`` is generation-biased
    out of the workload BEFORE paying for full variant labeling, and the
    marker makes that decision free on every rerun. Keyed alongside the
    bundle (same code+data fingerprints), so a labeling-code or data
    change re-probes. ``sql`` makes the marker re-keyable across
    verified-benign labeling-code changes (round-12 advice: rekey runs
    used to drop markers wholesale because, unlike bundles, they carried
    no SQL to recompute their key from)."""
    payload: dict = {"probe": True, "probe_s": probe_s,
                     "passed": bool(passed), "ms": ms}
    if sql is not None:
        payload["sql"] = sql
    _atomic_write(cache_dir, f"{key}-probe", payload)


def clear_probe(cache_dir: str, key: str) -> bool:
    """Remove ``key``'s probe marker if present — called once the full
    bundle is cached (``read_bundle`` then owns admission, so the marker
    is redundant; round-12 advice #4). True if a marker was removed.

    A crash between ``write_bundle`` and this call leaves a redundant
    marker behind; that is harmless (``read_bundle`` wins admission once
    the bundle exists) and the rekey tool's second pass garbage-collects
    it. Callers therefore need no ordering guarantees here."""
    try:
        os.remove(os.path.join(cache_dir, f"{key}-probe.json.gz"))
        return True
    except FileNotFoundError:
        return False


def read_probe(cache_dir: str, key: str, probe_s: float):
    """The stored probe marker for ``key`` at exactly ``probe_s``, or
    ``None`` (never probed / probed at a different budget)."""
    raw = read_bundle(cache_dir, f"{key}-probe")
    if (isinstance(raw, dict) and raw.get("probe")
            and raw.get("probe_s") == probe_s):
        return raw
    return None


def read_bundle(cache_dir: str, key: str):
    """Raw cache read: ``None`` (miss), a poison-marker dict, or the
    encoded candidate list. A legacy empty-list bundle (the round-6
    poisoned encoding) is normalized to a marker with one attempt spent."""
    path = os.path.join(cache_dir, f"{key}.json.gz")
    if not os.path.exists(path):
        return None
    with gzip.open(path, "rt") as fh:
        raw = json.load(fh)
    if raw == []:
        return {"poisoned": True, "attempts": 1, "error": "legacy"}
    return raw


#: sentinel distinguishing "caller did not pre-read the cache" from a
#: pre-read that legitimately returned ``None`` (a cache miss)
_NOT_PREREAD = object()


def cached_label_query(spark: "SparkSession", sql: str,
                       strategies: tuple[str, ...],
                       timeout_s: float | None, sf_dir: str,
                       cache_dir: str,
                       preread=_NOT_PREREAD) -> tuple[list[Candidate], bool]:
    """``label_query`` with a read-through, write-behind bundle cache.
    Hits rebuild the Candidate list from the stored bundle without
    touching the cluster; misses label live and persist the result. A
    poison marker under its retry budget is treated as a miss (the query
    relabels live — the caller records a new marker if it zombies again);
    an exhausted marker returns ``[]``, the same skip semantics as a
    plan-collapse bundle.

    Returns ``(candidates, hit)``. ``hit`` is True only when the result
    came from the cache — a stored candidate list or an EXHAUSTED poison
    marker; an under-budget marker that relabels live is a miss (round-8
    advice: counting any existing file as a hit let RESULTS.md overstate
    'N bundles from the committed label cache').

    ``preread`` lets a caller that already called ``read_bundle`` for
    this key (the probe admission path) hand the result through instead
    of paying a second decompress+parse (round-12 advice #4)."""
    key = bundle_key(sql, strategies, timeout_s, sf_dir)
    raw = read_bundle(cache_dir, key) if preread is _NOT_PREREAD else preread
    if isinstance(raw, list):
        return _decode(raw), True
    if isinstance(raw, dict) and raw.get("poisoned"):
        if int(raw.get("attempts", 1)) >= MAX_POISON_ATTEMPTS:
            return [], True
        # under budget: fall through and retry live
    cands = label_query(spark, sql, strategies, timeout_s)
    write_bundle(cache_dir, key, cands)
    # the probe marker (if any) is now redundant — the bundle owns
    # admission from here on (round-12 advice #4)
    clear_probe(cache_dir, key)
    return cands, False


__all__ = ["cached_label_query", "write_bundle", "read_bundle",
           "record_poisoned", "record_probe", "read_probe", "clear_probe",
           "bundle_key", "code_fingerprint", "data_fingerprint",
           "MAX_POISON_ATTEMPTS"]
