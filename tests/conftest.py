from __future__ import annotations

import gzip
import json
import os
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

FIXDIR = Path(__file__).resolve().parent / "fixtures"


def load_fixture(name: str) -> dict:
    with gzip.open(FIXDIR / f"{name}.json.gz", "rt") as f:
        return json.load(f)


def fixture_names() -> list[str]:
    return sorted(p.name[: -len(".json.gz")] for p in FIXDIR.glob("*.json.gz"))


@pytest.fixture(scope="session")
def spark():
    from gorilla_tsc_spark.session import get_spark

    s = get_spark(app_name="pytest", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
