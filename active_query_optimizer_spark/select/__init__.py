"""Active-learning coreset selection (reference ``coreset.py``)."""

from .coreset import (  # noqa: F401
    coreset_select,
    greedy_k_center,
    lsh_partition,
    standardize_and_normalize,
)
