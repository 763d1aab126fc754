"""Every registered oracle query must match DuckDB at sf0.001 (fast
mirror of the driver's sf0.01 gate; tools/parity.py runs the full one).
"""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

spec = importlib.util.spec_from_file_location("parity", REPO / "tools" / "parity.py")
parity = importlib.util.module_from_spec(spec)
sys.modules["parity"] = parity
spec.loader.exec_module(parity)

import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"
ORACLES = entrymod.oracle_sql()
ALL = list(entrymod.queries())


@pytest.fixture(scope="module")
def duck():
    return parity.duck_con(SF_DIR)


@pytest.mark.parametrize("name", ALL)
def test_query_parity(spark, duck, name):
    fn = entrymod.queries()[name]
    sdf = fn(spark, SF_DIR).toPandas()
    if name not in ORACLES:
        assert len(sdf) >= 0  # rows-only contract: must at least run
        return
    ddf = duck.sql(ORACLES[name]).df()
    assert len(sdf) == len(ddf), f"rowcount {len(sdf)} != {len(ddf)}"
    assert sorted(sdf.columns) == sorted(ddf.columns)
    cs, cd = parity.canon(sdf), parity.canon(ddf)
    assert cs.equals(cd), f"value mismatch for {name}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
