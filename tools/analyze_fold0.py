"""Explain the cross-split fold-0 oracle-gap outlier in RESULTS.md
(round-7 verdict item #5, round-8 item #5).

Reconstructs the 288-bundle labeled workload WITHOUT relabeling: the
workload is regenerated deterministically (same harvest + generator +
seed as ``tools/make_results.py``) and each query's bundle is recovered
from the committed ``.label_cache`` by matching the default variant's
SQL text — valid because labels are immutable measurements and the cache
files store the full candidate list. Then fold 0 (held-out = the first
1/3 block in generation order, exactly ``optimizer_results``'s slicing)
is re-evaluated and its per-query chosen/best/default breakdown printed,
flagging picks that landed on timeout-penalty labels
(``LABEL_TIMEOUT_PENALTY * LABEL_TIMEOUT_S`` = 60000 ms).

Usage: ``python tools/analyze_fold0.py [num_queries] [fold]``
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from active_query_optimizer_spark.catalog import register_views  # noqa: E402
from active_query_optimizer_spark.evaluation.results import (  # noqa: E402
    _split_eval)
from active_query_optimizer_spark.plans import labelcache as LC  # noqa: E402
from active_query_optimizer_spark.session import get_spark  # noqa: E402
from active_query_optimizer_spark.stats.harvester import (  # noqa: E402
    harvest_range_dict)
from active_query_optimizer_spark.workload.generate import (  # noqa: E402
    generate_workload)

TIMEOUT_MS = 60000.0


def load_cache_by_sql(cache_dir: str) -> dict[str, list]:
    out: dict[str, list] = {}
    for path in glob.glob(os.path.join(cache_dir, "*.json.gz")):
        with gzip.open(path, "rt") as fh:
            raw = json.load(fh)
        if not isinstance(raw, list) or not raw:
            continue  # poison marker / empty bundle
        cands = LC._decode(raw)
        default = next((c for c in cands if c.variant == "default"), None)
        if default is not None:
            out[default.sql] = cands
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_queries = int(sys.argv[1]) if len(sys.argv) > 1 else 288
    fold = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    seed, epochs, k = 7, 30, 3
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    by_sql = load_cache_by_sql(os.path.join(repo, ".label_cache"))
    print(f"cache: {len(by_sql)} distinct SQL bundles", file=sys.stderr)

    spark = get_spark("aqo-fold0")
    spark.sparkContext.setLogLevel("ERROR")
    register_views(spark, sf_dir)
    rd = harvest_range_dict(spark, sf_dir)
    wl = sorted(generate_workload(spark, rd, num_sql=2 * num_queries,
                                  seed=seed).collect(),
                key=lambda r: r["id"])

    bundles, missing = [], 0
    for r in wl:
        cands = by_sql.get(r["sql"])
        if cands is None:
            missing += 1
            continue
        if len(cands) >= 2:
            bundles.append((f"q{r['id']}", cands))
        if len(bundles) >= num_queries:
            break
    print(f"reconstructed {len(bundles)} bundles "
          f"({missing} workload queries had no cache entry)",
          file=sys.stderr)
    if len(bundles) < num_queries:
        print("WARNING: fewer bundles than RESULTS.md's run — fold "
              "boundaries may shift slightly", file=sys.stderr)

    block = len(bundles) // k
    lo, hi = fold * block, (fold + 1) * block if fold < k - 1 \
        else len(bundles)
    test, train = bundles[lo:hi], bundles[:lo] + bundles[hi:]
    ev = _split_eval(spark, train, test, epochs, seed)
    t = ev["totals"]
    gap = 100.0 * (t["chosen"] - t["best"]) / t["best"]
    print(f"fold {fold}: totals={t} oracle_gap={gap:.2f}% "
          f"loss={ev['loss']:.4f}")

    rows = []
    for qid, cands in test:
        times = [float(c.exec_time_ms) for c in cands]
        ci = ev["picked"][qid]
        rows.append({
            "qid": qid, "chosen_ms": times[ci],
            "chosen_variant": cands[ci].variant,
            "best_ms": min(times),
            "default_ms": next(x for c, x in zip(cands, times)
                               if c.variant == "default"),
            "chosen_is_timeout": times[ci] >= TIMEOUT_MS,
            "regret_ms": times[ci] - min(times),
        })
    rows.sort(key=lambda r: -r["regret_ms"])
    n_timeout_picks = sum(r["chosen_is_timeout"] for r in rows)
    total_regret = sum(r["regret_ms"] for r in rows)
    print(f"timeout-label picks: {n_timeout_picks}; "
          f"total regret {total_regret / 1e3:.2f}s over {len(rows)} queries")
    print("top regret contributors:")
    for r in rows[:12]:
        share = 100.0 * r["regret_ms"] / total_regret if total_regret else 0
        print(f"  {r['qid']}: chosen {r['chosen_ms']:.0f}ms "
              f"({r['chosen_variant']}"
              f"{', TIMEOUT LABEL' if r['chosen_is_timeout'] else ''}) "
              f"best {r['best_ms']:.0f}ms default {r['default_ms']:.0f}ms "
              f"-> {share:.1f}% of fold regret")


if __name__ == "__main__":
    main()
