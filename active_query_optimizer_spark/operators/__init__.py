"""Judge-facing operator inventory.

Importing this package populates ``registry.QUERIES`` / ``registry.ORACLES``
with every implemented operator (SURVEY.md §2 + the LLM-data-pipeline set).
"""

from . import relational  # noqa: F401
from .registry import ORACLES, QUERIES, register  # noqa: F401

# Optional modules land incrementally; keep imports tolerant so a partial
# checkout still exposes what exists.
for _mod in ("dedup", "similarity", "text", "multimodal", "statsops",
             "pipelineops", "streamops"):
    try:  # noqa: SIM105
        __import__(f"{__name__}.{_mod}")
    except ImportError:
        pass
