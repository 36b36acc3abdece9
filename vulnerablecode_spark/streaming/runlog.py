"""Pipeline run observability: run rows + exit-code state machine.

Reference: PipelineRun (models.py:1972-2258) — run_id, started/ended,
exit codes (0 success / 88 stale / 99 stopped), captured log text;
PipelineSchedule (models.py:2260-2300) — run_interval/priority. Here a
run-log table written append-only per execution (the SparkListener-level
metrics ride along as a JSON blob), and a scheduler descriptor the
orchestrator (Airflow/cron/Structured Streaming triggers) consumes.
"""

from __future__ import annotations

import json
import os
import time
import traceback
import uuid
from dataclasses import dataclass, field

EXIT_SUCCESS = 0
EXIT_STALE = 88
EXIT_STOPPED = 99
EXIT_FAILURE = 1

RUN_SCHEMA = ("run_id string, pipeline_id string, started_at double, "
              "ended_at double, exit_code int, status string, log string")


@dataclass
class PipelineSchedule:
    """Scheduling descriptor (models.py:2260-2300): the reference's RQ
    cadence table as plain data for any orchestrator."""
    pipeline_id: str
    run_interval_minutes: int = 720  # importer default (pipelines/__init__.py:294)
    priority: int = 5
    is_active: bool = True


# the reference's cadences (BASELINE.md): unfurl 10min, risk 30min,
# severity-relate 30min, importers 720min
DEFAULT_SCHEDULES = [
    PipelineSchedule("unfurl_version_range", 10, priority=1),
    PipelineSchedule("compute_package_risk", 30, priority=1),
    PipelineSchedule("relate_severities", 30, priority=3),
    PipelineSchedule("osv_importer", 720, priority=5),
]


@dataclass
class PipelineRun:
    pipeline_id: str
    log_path: str | None = None
    run_id: str = field(default_factory=lambda: str(uuid.uuid4()))
    started_at: float = 0.0
    ended_at: float = 0.0
    exit_code: int | None = None
    log_lines: list[str] = field(default_factory=list)

    def log(self, message: str) -> None:
        self.log_lines.append(f"{time.strftime('%Y-%m-%dT%H:%M:%S')} {message}")

    def __enter__(self) -> "PipelineRun":
        self.started_at = time.time()
        self.log(f"run {self.run_id} of {self.pipeline_id} started")
        return self

    def __exit__(self, exc_type, exc, tb) -> bool:
        self.ended_at = time.time()
        if exc_type is None:
            self.exit_code = EXIT_SUCCESS
            self.log("success")
        elif exc_type is KeyboardInterrupt:
            self.exit_code = EXIT_STOPPED
            self.log("stopped")
        else:
            self.exit_code = EXIT_FAILURE
            self.log("failed: " + "".join(
                traceback.format_exception_only(exc_type, exc)).strip())
        if self.log_path:
            os.makedirs(self.log_path, exist_ok=True)
            with open(os.path.join(self.log_path,
                                   f"{self.run_id}.json"), "w") as f:
                json.dump(self.row(), f)
        return False  # never swallow the exception

    def row(self) -> dict:
        status = {EXIT_SUCCESS: "success", EXIT_STALE: "stale",
                  EXIT_STOPPED: "stopped"}.get(self.exit_code, "failed")
        return {
            "run_id": self.run_id, "pipeline_id": self.pipeline_id,
            "started_at": self.started_at, "ended_at": self.ended_at,
            "exit_code": self.exit_code, "status": status,
            "log": "\n".join(self.log_lines),
        }


def load_run_log(spark, log_path: str):
    """Run rows as a DataFrame for the observability queries."""
    files = [os.path.join(log_path, f) for f in os.listdir(log_path)
             if f.endswith(".json")]
    rows = []
    for p in files:
        with open(p) as f:
            rows.append(json.load(f))
    return spark.createDataFrame(rows, RUN_SCHEMA)
