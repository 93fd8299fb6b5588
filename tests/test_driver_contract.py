"""The driver-contract gate, run at sf0.001 as the standing smoke+oracle
test: every registered query must run, and every oracle-expressible one
must hash-match its DuckDB twin (mirrors the driver's t2 check)."""

from __future__ import annotations

import pytest

from tests.conftest import SMOKE_SF
from tools.verify_local import value_hash


def _pairs():
    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    return [(name, fn, oracles.get(name)) for name, fn in qs.items()]


@pytest.mark.parametrize("name,fn,oracle", _pairs(), ids=[p[0] for p in _pairs()])
def test_query_matches_oracle(spark, duck, name, fn, oracle):
    sdf = fn(spark, SMOKE_SF)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    if oracle is None:
        assert srows is not None  # rows-only smoke: plan executed
        return
    res = duck.execute(oracle)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert len(srows) == len(drows), f"rowcount {len(srows)} != {len(drows)}"
    assert sorted(scols) == sorted(dcols)
    assert value_hash(scols, srows) == value_hash(dcols, drows)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    assert df.columns
