"""Backfill the query SQL into legacy probe/poison markers.

Markers recorded before round 12 carry no SQL, so a cache re-key cannot
recompute their key and previously dropped them — discarding paid-for
admission decisions (round-12 advice #1). The workload generator is
seeded and deterministic, so every marker's SQL is recoverable without
executing anything: regenerate the workload for the (sf_dir, timeout,
seed, num_sql) configuration the markers were recorded under, compute
each query's CURRENT ``bundle_key``, and where ``<key>-probe.json.gz``
(or a poison marker at ``<key>.json.gz``) exists without ``sql``,
rewrite the payload with it. Keys never change — this only makes the
markers migratable by ``tools/rekey_label_cache.py``.

Run this BEFORE any edit to a fingerprinted labeling source (the match
needs the markers' own code fingerprint to be current).

Usage::

    SPARK_GRAFT_SF_DIR=/root/repo/testdata_sf1 \
    python tools/backfill_probe_sql.py [num_sql] [seed] [timeout_s]

Defaults match the round-11 sf1 rehearsal: 128 generated queries,
seed 7, 90 s labeling deadline.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from active_query_optimizer_spark.catalog import register_views  # noqa: E402
from active_query_optimizer_spark.plans import labelcache as LC  # noqa: E402
from active_query_optimizer_spark.plans.explore import (  # noqa: E402
    HINT_STRATEGIES)
from active_query_optimizer_spark.session import get_spark  # noqa: E402
from active_query_optimizer_spark.stats.harvester import (  # noqa: E402
    harvest_range_dict)
from active_query_optimizer_spark.workload.generate import (  # noqa: E402
    generate_workload)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR",
                            os.path.join(REPO, "testdata_sf1"))
    num_sql = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    timeout_s = float(sys.argv[3]) if len(sys.argv) > 3 else 90.0
    cache_dir = os.path.join(REPO, ".label_cache")

    spark = get_spark("aqo-backfill-probe-sql")
    spark.sparkContext.setLogLevel("ERROR")
    register_views(spark, sf_dir)
    rd = harvest_range_dict(spark, sf_dir)
    wl = sorted(generate_workload(spark, rd, num_sql=num_sql,
                                  seed=seed).collect(),
                key=lambda r: r["id"])
    stats = {"probe_backfilled": 0, "probe_current": 0,
             "poison_backfilled": 0, "matched_bundles": 0}
    for r in wl:
        key = LC.bundle_key(r["sql"], HINT_STRATEGIES, timeout_s, sf_dir)
        raw = LC.read_bundle(cache_dir, key)
        if isinstance(raw, list):
            stats["matched_bundles"] += 1
        elif isinstance(raw, dict) and raw.get("poisoned") \
                and "sql" not in raw:
            raw["sql"] = r["sql"]
            LC._atomic_write(cache_dir, key, raw)
            stats["poison_backfilled"] += 1
        probe = LC.read_bundle(cache_dir, f"{key}-probe")
        if isinstance(probe, dict) and probe.get("probe"):
            if "sql" in probe:
                stats["probe_current"] += 1
            else:
                probe["sql"] = r["sql"]
                LC._atomic_write(cache_dir, f"{key}-probe", probe)
                stats["probe_backfilled"] += 1
    print(f"workload: {len(wl)} queries @ seed {seed}, "
          f"timeout {timeout_s}s, {sf_dir}")
    print(stats)


if __name__ == "__main__":
    main()
