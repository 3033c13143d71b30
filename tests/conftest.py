import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bazof_spark.session import get_spark  # noqa: E402

# Environmental Python-worker-spawn failures (opt round 2). The host
# this suite runs on has documented multi-minute scheduler-wakeup
# degradation windows (OPTIMIZATION_r12.md "Session 3"); during one,
# a freshly spawned Python worker (the NON-daemon simple worker the
# Python Data Source planner/stream reader uses) can take longer than
# PythonWorkerFactory's HARDCODED 10 s accept timeout
# (Selector.select(10000L) — no Spark conf raises it) to import
# pyspark and connect back, which killed the r12 driver's suite at
# tests/test_delete.py (fail-fast) on
# "java.net.SocketTimeoutException: Timed out while waiting for the
# Python worker to connect back". The failure is load, not logic:
# the same test passed 3x in full-suite runs on the same tree. A
# bounded, signature-gated rerun makes the suite robust to the window
# without masking real failures — only these exact worker-spawn
# signatures ever retry, and at most twice per test.
_WORKER_SPAWN_SIGNATURES = (
    "Timed out while waiting for the Python worker to connect back",
    "Python worker failed to connect back",
    "Python worker exited unexpectedly",
)
_MAX_WORKER_SPAWN_RERUNS = 2


def _is_worker_spawn_flake(report) -> bool:
    if not report.failed:
        return False
    text = str(getattr(report, "longrepr", "") or "")
    return any(sig in text for sig in _WORKER_SPAWN_SIGNATURES)


def pytest_runtest_protocol(item, nextitem):
    from _pytest.runner import runtestprotocol

    reports = runtestprotocol(item, nextitem=nextitem, log=False)
    for _ in range(_MAX_WORKER_SPAWN_RERUNS):
        if not any(_is_worker_spawn_flake(r) for r in reports):
            break
        sys.stderr.write(
            f"\n[conftest] {item.nodeid}: environmental Python-worker "
            "spawn timeout (hardcoded 10s accept window on a degraded "
            "host) — retrying once\n"
        )
        reports = runtestprotocol(item, nextitem=nextitem, log=False)
    for report in reports:
        item.ihook.pytest_runtest_logreport(report=report)
    return True


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="bazof-tests", shuffle_partitions=8)
    # Pre-warm the Python worker daemon before any test runs: the
    # first Python-boundary job of a session pays daemon + worker
    # interpreter startup, exactly the phase the degraded-host windows
    # tax hardest. One trivial Arrow-batched job makes the daemon and
    # one pooled worker exist up front, off any test's clock.
    try:
        from pyspark.sql import functions as F

        s.range(2).select(
            F.udf(lambda x: x, "long", useArrow=True)("id")
        ).write.format("noop").mode("overwrite").save()
    except Exception:
        pass  # warmup is best-effort; tests proceed regardless
    yield s
