"""Oracle-parity tests for the Layer-A relational inventory — the local
replica of the driver's t2 correctness gate."""

from __future__ import annotations

import pytest

from active_query_optimizer_spark.operators import ORACLES, QUERIES

from .conftest import SF_SMALL
from .oracle_util import compare, run_oracle

RELATIONAL = sorted(n for n in QUERIES if n in ORACLES)


@pytest.mark.parametrize("name", RELATIONAL)
def test_oracle_parity(spark, name):
    df = QUERIES[name](spark, SF_SMALL)
    oracle = run_oracle(ORACLES[name], SF_SMALL)
    compare(df, oracle, name)


ROWS_ONLY = sorted(n for n in QUERIES if n not in ORACLES)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_output_is_driver_hashable(spark, name):
    """The driver canonicalizes even rows-only output with a plain pandas
    sort whose hash path rejects non-scalar cells (round-2 red row:
    ``multimodal_resize_grid`` returned ``array<float>`` → ``TypeError:
    unhashable type: 'list'``). Every registered query must therefore emit
    scalar-only cells; array-typed results belong in non-registered
    pipeline functions."""
    sp = QUERIES[name](spark, SF_SMALL).limit(50).toPandas()
    for col in sp.columns:
        for v in sp[col]:
            assert not isinstance(v, (list, tuple, dict)), (
                f"{name}.{col} holds non-scalar cells ({type(v).__name__})")
            assert not (hasattr(v, "tolist")
                        and not isinstance(v, (str, bytes, bytearray))
                        and getattr(v, "ndim", 0)), (
                f"{name}.{col} holds ndarray cells")


def test_driver_order_is_exhaustive():
    """_reorder() appends unknown registrations at the tail instead of
    dropping them (fail-safe), but the curated list must still name every
    query so window placement is deliberate — this assertion is the loud
    guard (works under ``python -O``, unlike the old bare assert)."""
    from active_query_optimizer_spark.operators import _DRIVER_ORDER

    assert sorted(_DRIVER_ORDER) == sorted(QUERIES), (
        "update _DRIVER_ORDER: "
        f"extra={sorted(set(QUERIES) - set(_DRIVER_ORDER))} "
        f"stale={sorted(set(_DRIVER_ORDER) - set(QUERIES))}")
    assert len(set(_DRIVER_ORDER)) == len(_DRIVER_ORDER), "duplicate entries"


def test_entry_smoke(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert rows[0]["cnt"] >= 0
    qs, os_ = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(os_) <= set(qs)
