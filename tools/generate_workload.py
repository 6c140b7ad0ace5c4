"""Workload bootstrap CLI — the reference's §3.2 lifecycle as one command.

Reproduces ``pg.py`` + ``create_sql.py`` __main__ flows: harvest stats from
the catalog, mine the seed workload, generate a pool of
join-graph-connected COUNT(*) queries, and write them in the reference's
``qid#####SQL`` line format (``data/unlabeled_train_data/…_train_pool.txt``
analog). Artifacts land under the repo's ``artifacts/`` directory.

Usage:
  python tools/generate_workload.py [sf_dir] [num_sql] [mode]
  mode ∈ {freeform, template, imdb}  (default freeform)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from active_query_optimizer_spark.catalog import register_views  # noqa: E402
from active_query_optimizer_spark.session import get_spark  # noqa: E402
from active_query_optimizer_spark.stats import harvester as H  # noqa: E402
from active_query_optimizer_spark.sources.workload_text import (  # noqa: E402
    write_workload_text)
from active_query_optimizer_spark.workload import generate as G  # noqa: E402

ARTIFACTS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "artifacts")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    num_sql = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    mode = sys.argv[3] if len(sys.argv) > 3 else "freeform"

    spark = get_spark("workload-gen")
    spark.sparkContext.setLogLevel("ERROR")
    register_views(spark, sf_dir)

    os.makedirs(ARTIFACTS, exist_ok=True)
    tables = ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem")
    rd = H.harvest_range_dict(spark, sf_dir, tables=tables)
    H.write_infos(rd, os.path.join(ARTIFACTS, "range_dict.json"))

    if mode == "freeform":
        wl = G.generate_workload(spark, rd, num_sql=num_sql, seed=42)
    elif mode in ("template", "imdb"):
        wl = G.generate_workload_template(
            spark, rd, num_sql=num_sql, seed=42,
            imdb_style=(mode == "imdb"))
    else:
        raise SystemExit(f"unknown mode {mode!r}")

    pool_dir = os.path.join(ARTIFACTS, f"train_pool_{mode}")
    write_workload_text(wl, pool_dir)

    # sanity: every generated query runs on the engine itself
    sample = wl.limit(5).collect()
    for r in sample:
        spark.sql(r["sql"]).collect()

    print(json.dumps({
        "sf_dir": sf_dir, "mode": mode, "num_sql": num_sql,
        "range_dict": os.path.join(ARTIFACTS, "range_dict.json"),
        "pool": pool_dir,
        "sample": sample[0]["sql"] if sample else None,
    }))


if __name__ == "__main__":
    main()
