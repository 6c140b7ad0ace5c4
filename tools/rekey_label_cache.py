"""Re-key the committed label cache after a bundle_key schema change.

The round-8 key change (data/catalog fingerprints) and the round-9 one
(mtime-free content sample) both invalidate every committed cache file's
NAME while leaving the labels themselves perfectly valid — a label is a
measurement of (sql, strategies, timeout, data, labeling code), and this
tool refuses to run unless the labeling code is bit-identical to what
the cache was measured under (the four ``_FINGERPRINT_FILES`` must be
unchanged in git since the cache files' last commit; pass
``--force-code-ok`` only if you have verified that out of band).

For every stored candidate-list bundle, the query SQL is recovered from
its ``default`` variant (``plan_variants`` always emits one) and the
bundle is re-written under the CURRENT ``bundle_key``. Poison markers
cannot be re-keyed (they store no SQL) and are dropped — their retry
budget resets, which is the conservative direction. Old-key files are
removed so the cache directory stays one-file-per-bundle.

Usage: ``python tools/rekey_label_cache.py [--dry-run]``
(env: SPARK_GRAFT_SF_DIR, default /root/testdata/sf0.1 — must be the
directory the labels were measured against).
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from active_query_optimizer_spark.evaluation.results import (  # noqa: E402
    LABEL_TIMEOUT_S)
from active_query_optimizer_spark.plans import labelcache as LC  # noqa: E402
from active_query_optimizer_spark.plans.explore import (  # noqa: E402
    HINT_STRATEGIES)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def code_unchanged_since(cache_dir: str) -> bool:
    """True iff none of the fingerprinted source files changed after the
    cache directory's last committed change."""
    last = subprocess.run(
        ["git", "log", "-1", "--format=%H", "--", cache_dir],
        cwd=REPO, capture_output=True, text=True).stdout.strip()
    if not last:
        return False
    pkg = "active_query_optimizer_spark"
    paths = [os.path.join(pkg, rel) for rel in LC._FINGERPRINT_FILES]
    diff = subprocess.run(
        ["git", "log", "--oneline", f"{last}..HEAD", "--", *paths],
        cwd=REPO, capture_output=True, text=True).stdout.strip()
    return diff == ""


def main() -> None:
    dry = "--dry-run" in sys.argv
    force = "--force-code-ok" in sys.argv
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cache_dir = os.path.join(REPO, ".label_cache")
    if not force and not code_unchanged_since(cache_dir):
        sys.exit("REFUSING: a fingerprinted labeling-source file changed "
                 "since the cache was committed — the stored labels were "
                 "measured under different code; relabel instead.")

    moved = skipped_current = dropped = 0
    for path in sorted(glob.glob(os.path.join(cache_dir, "*.json.gz"))):
        old_key = os.path.basename(path)[: -len(".json.gz")]
        with gzip.open(path, "rt") as fh:
            raw = json.load(fh)
        if not isinstance(raw, list) or not raw:
            print(f"drop (no SQL to re-key): {old_key}")
            dropped += 1
            if not dry:
                os.remove(path)
            continue
        sql = next((c["sql"] for c in raw if c["variant"] == "default"),
                   None)
        if sql is None:
            print(f"drop (no default variant): {old_key}")
            dropped += 1
            if not dry:
                os.remove(path)
            continue
        new_key = LC.bundle_key(sql, HINT_STRATEGIES, LABEL_TIMEOUT_S,
                                sf_dir)
        if new_key == old_key:
            skipped_current += 1
            continue
        if not dry:
            LC._atomic_write(cache_dir, new_key, raw)
            os.remove(path)
        moved += 1
    print(f"re-keyed {moved}, already-current {skipped_current}, "
          f"dropped {dropped}{' (dry run)' if dry else ''}")


if __name__ == "__main__":
    main()
