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


def test_entry_smoke(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert rows[0]["cnt"] >= 0
    qs, os_ = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(os_) <= set(qs)
