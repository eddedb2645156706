from __future__ import annotations

import os
import shutil
import tempfile

import pytest

from logrange_spark import Engine, build_session

# the suite includes x10-scale plan/behavior tests that were tuned at the
# bench heap; the LIBRARY default is a conservative 8g (session.py)
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")


@pytest.fixture(scope="session")
def spark():
    s = build_session(app_name="logrange-spark-tests", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


NS = 10**9
BASE_TS = 1_700_000_000 * NS


@pytest.fixture()
def engine(spark):
    root = tempfile.mkdtemp(prefix="lrspark-")
    e = Engine(spark, root)
    yield e
    e.close()
    shutil.rmtree(root, ignore_errors=True)


@pytest.fixture()
def loaded_engine(engine):
    """Engine with three partitions of deterministic events."""
    evs_app1 = [
        (
            BASE_TS + i * NS,
            f"line {i} {'ERROR' if i % 3 == 0 else 'info'} path/{i}",
            {"level": "error" if i % 3 == 0 else "info", "n": str(i)},
        )
        for i in range(30)
    ]
    evs_app2 = [
        (BASE_TS + i * NS + 500, f"app2 msg {i}", {"level": "warn"})
        for i in range(20)
    ]
    evs_db = [(BASE_TS + i * 2 * NS, f"db query {i}", {}) for i in range(10)]
    engine.write({"name": "app1", "ns": "system"}, evs_app1)
    engine.write({"name": "app2", "ns": "dev"}, evs_app2)
    engine.write({"name": "db", "host": "h-01"}, evs_db)
    return engine
