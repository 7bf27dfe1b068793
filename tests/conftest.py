import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from athena_delta_lake_spark import get_spark

    s = get_spark(
        app_name="tests", master="local[8]", shuffle_partitions=8
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(params=["classic", "light"])
def plane(request, monkeypatch):
    """Run a test on BOTH planning planes. 'light' forces the
    light-planning threshold to 1 (0 would DISABLE it — log.py
    light_planning_threshold) so every scan / DML candidate selection at
    or past a checkpoint routes through LightSnapshot instead of the
    classic driver-side replay. Engagement still requires a
    `_last_checkpoint`, so light-plane walks must write one up front —
    use `force_light_engaged(path)` and it asserts the route is live."""
    from athena_delta_lake_spark.delta.log import DeltaLog

    if request.param == "light":
        monkeypatch.setenv("ADLS_LIGHT_PLANNING_FILES", "1")
        DeltaLog.clear_cache()
        yield "light"
        DeltaLog.clear_cache()
    else:
        # an externally-exported threshold (e.g. =1 left over from a perf
        # session) would silently turn this into a second light run — the
        # inverse of the silent-fallback class this fixture guards against
        monkeypatch.delenv("ADLS_LIGHT_PLANNING_FILES", raising=False)
        DeltaLog.clear_cache()
        yield "classic"
        DeltaLog.clear_cache()


def force_light_engaged(path: str) -> None:
    """Checkpoint `path` and assert light planning actually engaged —
    a walk that silently fell back to classic would otherwise 'pass'
    while testing nothing (the round-10 silent-fallback bug class)."""
    from athena_delta_lake_spark.delta.log import DeltaLog
    from athena_delta_lake_spark.delta.writer import write_checkpoint

    write_checkpoint(path)
    DeltaLog.clear_cache()
    assert DeltaLog(path).light_planning_engaged(), (
        f"light planning did not engage on {path} despite forced threshold"
    )
