"""Materialization plans: SQL model runner, checks, cost guard."""

from pipelines_spark.plans.models import ModelRunner, SqlModel  # noqa: F401
from pipelines_spark.plans.checks import Check, run_checks  # noqa: F401
from pipelines_spark.plans.cost_guard import estimate_scan_bytes, guard_scan  # noqa: F401
