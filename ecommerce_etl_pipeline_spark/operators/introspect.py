"""Cost attribution from Spark's public monitoring REST API.

Turns SCALING.md's plan-shape claims into measured numbers: for any
action, report the exact shuffle read/write bytes, input bytes, and
executor time of the stages it ran — the quantities that dominate at
cluster scale. Uses the per-application REST endpoint
(`/api/v1/applications/<id>/stages`) that every Spark UI serves, so the
same harness works unchanged against a cluster's history server.

This is an ENGINE DIAGNOSTIC, not a query operator: the numbers come
from the scheduler, not the data, so there is no DuckDB oracle — the
committed consumer is scripts/cost_report.py, which writes COSTS.md
per round.
"""

from __future__ import annotations

import json
import urllib.request
from collections.abc import Callable
from typing import Any


#: Bounded waits everywhere: an unattended round-documentation run must
#: FAIL on a wedged UI endpoint or listener queue, never hang.
_HTTP_TIMEOUT_S = 60
_LISTENER_TIMEOUT_MS = 30_000


def _api(spark, path: str) -> Any:
    base = spark.sparkContext.uiWebUrl
    if not base:
        raise RuntimeError("Spark UI is disabled; enable spark.ui.enabled for cost reports")
    with urllib.request.urlopen(f"{base}/api/v1/{path}", timeout=_HTTP_TIMEOUT_S) as r:
        return json.load(r)


def _app_id(spark) -> str:
    return _api(spark, "applications")[0]["id"]


#: (REST stage field, output key) — ONE mapping drives both the summation
#: and the rename, so a counter can't be summed-but-dropped or renamed-
#: but-missing.
_FIELD_MAP = (
    ("shuffleWriteBytes", "shuffle_write_bytes"),
    ("shuffleReadBytes", "shuffle_read_bytes"),
    ("shuffleWriteRecords", "shuffle_write_records"),
    ("shuffleReadRecords", "shuffle_read_records"),
    ("inputBytes", "input_bytes"),
    ("inputRecords", "input_records"),
    ("executorRunTime", "executor_run_time_ms"),
    ("numTasks", "num_tasks"),
)


def _drain_listeners(spark) -> None:
    """Block until the async status-listener queue has processed every
    posted event: the REST status store is fed by AppStatusListener on the
    'appStatus' queue, so without this a just-finished stage's completion
    event can still be in flight — the snapshot would undercount this
    action or, worse, attribute the stage to the NEXT measured one."""
    try:
        spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty(_LISTENER_TIMEOUT_MS)
    except Exception:  # newer signature is no-arg; bound it with the HTTP timeout
        try:
            spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty()
        except Exception:  # noqa: BLE001
            pass  # best effort; counters may lag one snapshot


def _completed_stage_ids(spark, app_id: str) -> set[int]:
    _drain_listeners(spark)
    return {
        (s["stageId"], s["attemptId"])
        for s in _api(spark, f"applications/{app_id}/stages?status=complete")
    }


def stage_cost_report(spark, action: Callable[[], None]) -> dict[str, int]:
    """Run ``action`` and return the summed stage-level cost counters of
    exactly the stages it executed (snapshot-delta over the completed-
    stage set, so concurrent history doesn't leak in as long as no OTHER
    job runs between the snapshots — single-threaded harness use).

    Returned keys: shuffle_write_bytes / shuffle_read_bytes /
    shuffle_write_records / shuffle_read_records / input_bytes /
    input_records / executor_run_time_ms / num_tasks / num_stages.
    """
    app_id = _app_id(spark)
    before = _completed_stage_ids(spark, app_id)
    action()
    _drain_listeners(spark)
    stages = _api(spark, f"applications/{app_id}/stages?status=complete")
    mine = [s for s in stages if (s["stageId"], s["attemptId"]) not in before]
    out = {
        out_key: sum(int(s.get(api_field) or 0) for s in mine)
        for api_field, out_key in _FIELD_MAP
    }
    out["num_stages"] = len(mine)
    return out
