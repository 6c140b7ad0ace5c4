"""Label cache for the optimizer-results pipeline (round-5 verdict #2).

Labeling is the artifact run's long pole: every candidate variant of every
generated query executes once at sf0.1 (~3h for 224 queries in round 5),
and growing the workload re-labeled everything from scratch. This module
makes growth incremental: a labeled bundle is persisted under a key of

    (sql text, strategy tuple, timeout, sf_dir, code fingerprint)

where the code fingerprint hashes the three modules whose behavior the
labels embed — ``plans/explore.py`` (variant construction, timing,
realized-plan capture), ``plans/featurize.py`` (plan serialization) and
``session.py`` (the session confs execution runs under). Any edit to
those files invalidates every cached label, so a stale label can never
survive an operator/labeling change; a workload-generator change shows up
in the SQL text itself.

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
_FINGERPRINT_FILES = ("plans/explore.py", "plans/featurize.py", "session.py")


def code_fingerprint() -> str:
    """Hash of the labeling-relevant source files (see module docstring)."""
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    h = hashlib.sha256()
    for rel in _FINGERPRINT_FILES:
        with open(os.path.join(pkg_root, rel), "rb") as fh:
            h.update(fh.read())
        h.update(b"\0")
    return h.hexdigest()[:16]


def bundle_key(sql: str, strategies: tuple[str, ...],
               timeout_s: float | None, sf_dir: str) -> str:
    """Content key for one labeled bundle (includes the code fingerprint)."""
    payload = json.dumps(
        [sql, list(strategies), timeout_s, os.path.normpath(sf_dir),
         code_fingerprint()],
        sort_keys=True)
    return hashlib.sha256(payload.encode()).hexdigest()[:32]


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
            hint_realized=r["hint_realized"]))
    return out


def write_bundle(cache_dir: str, key: str, cands: list[Candidate]) -> None:
    """Persist one labeled bundle atomically (tmp + rename), so a killed
    run keeps every bundle it finished — the incremental-growth property.
    An EMPTY list is a valid bundle: it marks a poisoned/unrankable query
    so reruns skip it instantly."""
    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(cache_dir, f"{key}.json.gz")
    tmp = f"{path}.tmp.{os.getpid()}"
    with gzip.open(tmp, "wt") as fh:
        json.dump(_encode(cands), fh)
    os.replace(tmp, path)


def cached_label_query(spark: "SparkSession", sql: str,
                       strategies: tuple[str, ...],
                       timeout_s: float | None, sf_dir: str,
                       cache_dir: str) -> list[Candidate]:
    """``label_query`` with a read-through, write-behind bundle cache.
    Hits rebuild the Candidate list from the stored bundle without
    touching the cluster; misses label live and persist the result."""
    key = bundle_key(sql, strategies, timeout_s, sf_dir)
    path = os.path.join(cache_dir, f"{key}.json.gz")
    if os.path.exists(path):
        with gzip.open(path, "rt") as fh:
            return _decode(json.load(fh))
    cands = label_query(spark, sql, strategies, timeout_s)
    write_bundle(cache_dir, key, cands)
    return cands


__all__ = ["cached_label_query", "write_bundle", "bundle_key",
           "code_fingerprint"]
