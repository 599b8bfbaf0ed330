from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from sparkmerge.session import get_spark

    s = get_spark("sparkmerge-tests")
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture()
def tmp_table_dir(tmp_path):
    return str(tmp_path / "table")


def changeset_flat(df):
    """Order-insensitive canonical form of a changeset frame (struct columns
    included) for strategy-equivalence assertions — single definition shared
    by the golden and hypothesis suites."""
    from pyspark.sql import functions as F

    return sorted(map(repr, df.select(F.to_json(F.struct(*df.columns))).collect()))
