from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


@pytest.fixture(scope="session")
def spark():
    from degenter_clickhouse_spark.session import build_session

    s = build_session(app_name="degenter-tests", cpus=8)
    yield s
    s.stop()
