"""Safety contract of tools/rekey_label_cache.py (round-9 advice,
medium): the committed label cache mixes bundles measured under
different (sf_dir, timeout) configurations, so a bare invocation must
never MOVE anything — every committed file must already be recognized as
current under one of the known configurations, and orphans (old-schema
keys) must be left in place unless provenance is stated explicitly."""

from __future__ import annotations

import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.mark.skipif(not (REPO / ".label_cache").is_dir(),
                    reason="no committed label cache")
def test_bare_dry_run_moves_nothing():
    out = subprocess.run(
        [sys.executable, "tools/rekey_label_cache.py", "--dry-run",
         "--force-code-ok"],
        cwd=REPO, capture_output=True, text=True, timeout=600,
        env={**os.environ, "PYTHONPATH": str(REPO)})
    # exit 0 (no orphans) or 2 (orphans listed, left in place) are both
    # non-destructive; anything else is a tool failure
    assert out.returncode in (0, 2), out.stderr[-2000:]
    summary = [ln for ln in out.stdout.splitlines()
               if ln.startswith("re-keyed ")]
    assert summary, out.stdout[-2000:]
    # without --orphans-from, nothing may move (poison markers may still
    # be counted as droppable — that reset is documented tool behavior)
    assert "re-keyed 0," in summary[0], summary[0]
