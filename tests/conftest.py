"""Shared session-scoped Spark fixture + canonical test tables.

Mirrors the reference's shared pytest fixtures (``test/conftest.py``,
reproduced in FIXTURES.md): the wide_1/wide_2 family with a shared
x,y,z index, plus small frames for filter/dedup/reindex tests.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parq_tools_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    spark = get_spark("parq_tools_spark_tests")
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture()
def wide_tables(spark, tmp_path):
    """Three parquet files with identical x,y,z index streams (FIXTURES F1)."""
    import pandas as pd

    n = 10
    base = {"x": range(1, n + 1), "y": range(11, n + 11), "z": range(21, n + 21)}
    pd.DataFrame({**base, "a": [f"val{i}" for i in range(1, n + 1)]}).to_parquet(
        tmp_path / "wide_1.parquet", index=False
    )
    pd.DataFrame({**base, "b": [float(i) for i in range(1, n + 1)]}).to_parquet(
        tmp_path / "wide_2.parquet", index=False
    )
    pd.DataFrame({**base, "c": [i * 2 for i in range(1, n + 1)]}).to_parquet(
        tmp_path / "wide_3.parquet", index=False
    )
    return {
        "wide_1": str(tmp_path / "wide_1.parquet"),
        "wide_2": str(tmp_path / "wide_2.parquet"),
        "wide_3": str(tmp_path / "wide_3.parquet"),
    }


def pytest_collection_modifyitems(config, items):
    """The oracle sweeps only run when explicitly selected with
    `-m oracles` (sf0.001+sf0.01) or `-m oracles_sf01` (sf0.1, the
    round-close tri-scale record) — each re-executes the whole query
    registry."""
    selected = config.getoption("-m") or ""
    skip = pytest.mark.skip(reason="oracle sweep: select with -m oracles")
    skip01 = pytest.mark.skip(
        reason="sf0.1 sweep: select with -m oracles_sf01"
    )
    for item in items:
        if "oracles_sf01" in item.keywords:
            if "oracles_sf01" not in selected:
                item.add_marker(skip01)
        elif "oracles" in item.keywords and "oracles" not in selected:
            item.add_marker(skip)
