"""SURVEY §5 item 4: fixed as_of + stable sorts ⇒ two runs of every
registered query produce identical value hashes (mirrors the
reference's idempotency claim, README.md:11)."""

from __future__ import annotations

import pytest

from tests.conftest import SMOKE_SF
from tools.verify_local import value_hash


def _names():
    import __spark_entry__ as e

    return sorted(e.queries())


@pytest.mark.parametrize("name", _names())
def test_query_is_deterministic(spark, name):
    import __spark_entry__ as e

    fn = e.queries()[name]
    runs = []
    for _ in range(2):
        df = fn(spark, SMOKE_SF)
        runs.append(value_hash(df.columns, [tuple(r) for r in df.collect()]))
    assert runs[0] == runs[1], f"{name} not deterministic across runs"
