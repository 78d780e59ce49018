"""Primary gate: every registered op with an oracle hash-matches DuckDB
(SURVEY.md §5.1), and every oracle-less op at least returns rows with a
stable schema. Runs at sf0.001 by default (fast); set
SPARK_GRAFT_TEST_SF=/root/testdata/sf0.01 to mirror the driver exactly.
"""

from __future__ import annotations

import os

import pytest

from mimranalytics_core_spark.registry import all_ops
from tests.compare import compare, duck_connect

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

OPS = all_ops()


@pytest.fixture(scope="module")
def duck():
    con = duck_connect(SF)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(OPS))
def test_op(name, spark, duck):
    spec = OPS[name]
    df = spec.fn(spark, SF)
    if spec.oracle is None:
        assert df.count() >= 0  # rows-only: runs and has a stable schema
        assert len(df.schema.fields) > 0
        return
    problems = compare(df, duck, spec.oracle, name)
    assert not problems, "\n".join(problems)
