"""Experiment tracking (M13).

The reference logs params/metrics/models to MLflow
(`/root/reference/Instructor/03-Fraud-ML.py:207-210`). MLflow is an
optional dependency here: when importable, calls pass through; when
absent, they record to an in-process dict so pipelines never break.
"""

from __future__ import annotations

import contextlib
from typing import Any

try:  # optional dependency
    import mlflow  # type: ignore

    _HAVE_MLFLOW = True
except Exception:  # pragma: no cover - environment-dependent
    mlflow = None
    _HAVE_MLFLOW = False

_LOCAL_RUNS: list[dict[str, Any]] = []


def _current() -> dict[str, Any]:
    if not _LOCAL_RUNS:
        _LOCAL_RUNS.append({"params": {}, "metrics": {}})
    return _LOCAL_RUNS[-1]


@contextlib.contextmanager
def tracking_run(run_name: str = "run"):
    """``with tracking_run():`` — mlflow.start_run when available,
    local-dict run otherwise."""
    if _HAVE_MLFLOW:
        with mlflow.start_run(run_name=run_name) as r:
            yield r
        return
    _LOCAL_RUNS.append({"name": run_name, "params": {}, "metrics": {}})
    yield _LOCAL_RUNS[-1]


def log_params(params: dict[str, Any]) -> None:
    if _HAVE_MLFLOW:
        mlflow.log_params(params)
    else:
        _current()["params"].update(params)


def log_metrics(metrics: dict[str, float]) -> None:
    if _HAVE_MLFLOW:
        mlflow.log_metrics(metrics)
    else:
        _current()["metrics"].update(metrics)


def local_runs() -> list[dict[str, Any]]:
    """Test hook: the in-process run log when mlflow is absent."""
    return _LOCAL_RUNS
