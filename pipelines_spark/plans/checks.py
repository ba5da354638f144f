"""Data-check harness (SURVEY U5, §5).

The reference runs a catalog of named SQL checks where a check passes
iff its query returns zero rows (or a ratio clears a threshold), and
reports failures (reference: pipelines/rj_smtr/utils.py:1139-1206
``perform_check``/``perform_checks_for_table``; catalog
pipelines/rj_smtr/constants.py:170-560, e.g. the ≥96% GPS
stage-survival ratio at :244-346).

Engine-native: each check is a SQL string with {vars}; expect-empty
checks are evaluated with a LIMIT-1 existence probe (no full count at
100 TB), ratio checks evaluate their scalar result.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import SparkSession


@dataclass
class Check:
    name: str
    sql: str
    kind: str = "expect_empty"  # expect_empty | expect_true
    description: str = ""

    def render(self, variables: dict[str, str]) -> str:
        out = self.sql
        for k, v in variables.items():
            out = out.replace("{" + k + "}", str(v))
        return out


@dataclass
class CheckResult:
    name: str
    passed: bool
    detail: str = ""


def run_checks(
    spark: SparkSession,
    checks: list[Check],
    variables: dict[str, str] | None = None,
) -> list[CheckResult]:
    results = []
    for check in checks:
        df = spark.sql(check.render(variables or {}))
        if check.kind == "expect_empty":
            offending = df.limit(1).collect()
            results.append(
                CheckResult(check.name, not offending, f"first offending row: {offending}" if offending else "")
            )
        elif check.kind == "expect_true":
            row = df.collect()
            ok = bool(row and all(bool(v) for v in row[0]))
            results.append(CheckResult(check.name, ok, str(row[0]) if row else "empty result"))
        else:
            raise ValueError(f"unknown check kind {check.kind}")
    return results
