"""Evaluation metrics for the plan ranker (reference ``Lero/lero_test.py``)."""

from .metrics import ranking_loss, selection_report, spearman_by_group  # noqa: F401
