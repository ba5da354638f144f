"""Quick standalone parity check for a subset of queries: run the
Spark query and the DuckDB oracle side by side at a given sf_dir and
compare rows/columns/values (order-insensitive), mirroring the
driver's gate. Usage:

    python scripts/parity_check.py q1_pricing_summary t3_sliding_window ...

Diff-scoped gate mode (r10 verdict #4 — new/touched queries pay the
sf0.1 parity toll every round, not just in one-off sweeps):

    SPARK_GRAFT_PARITY_SF=/root/testdata/sf0.1 \
        python scripts/parity_check.py --touched [base-ref]

``--touched`` computes the round's touched registry entries from
``git diff <base-ref>..HEAD`` (default base-ref: the last driver
round commit, ``git log --grep '^round '``): a query is touched if
its defining function in queries.py changed, its RENDERED ORACLES
value differs from the base revision (replayed via ``git show`` so
helper-CTE edits select their dependents), or its function source
references a changed pipelines_spark module (conservative substring
match — over-selects, never under-selects within the registry's own
code).

Env: SPARK_GRAFT_PARITY_SF (default /root/testdata/sf0.01).
"""

from __future__ import annotations

import datetime
import decimal
import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pipelines_spark.oracles import ORACLES
from pipelines_spark.queries import QUERIES
from pipelines_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_PARITY_SF", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v + 0.0)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    if isinstance(v, decimal.Decimal):
        return repr(float(v))
    return v


def _changed_lines(base: str, path: str) -> set[int]:
    """NEW-side line numbers changed since ``base`` for ``path``."""
    import re
    import subprocess

    out = subprocess.run(
        ["git", "diff", "--unified=0", base, "HEAD", "--", path],
        capture_output=True,
        text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        check=True,
    ).stdout
    lines: set[int] = set()
    for m in re.finditer(r"^@@ -\S+ \+(\d+)(?:,(\d+))? @@", out, re.M):
        start = int(m.group(1))
        n = int(m.group(2)) if m.group(2) is not None else 1
        lines.update(range(start, start + max(n, 1)))
    return lines


def _last_round_commit() -> str:
    import subprocess

    out = subprocess.run(
        ["git", "log", "--grep", "^round ", "-1", "--format=%H"],
        capture_output=True,
        text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        check=True,
    ).stdout.strip()
    return out or "HEAD~1"


def _oracle_entries_changed(base: str, repo: str) -> set[str]:
    """ORACLES keys whose rendered SQL differs from the ``base``
    revision: exec the old oracles.py and compare values key-by-key.
    Any failure to replay the base (missing file, import drift)
    over-selects to the full registry — never under-selects."""
    import subprocess

    out = subprocess.run(
        ["git", "show", f"{base}:pipelines_spark/oracles.py"],
        capture_output=True,
        text=True,
        cwd=repo,
    )
    if out.returncode != 0:  # file absent at base: everything is new
        return set(ORACLES)
    ns: dict = {}
    try:
        exec(compile(out.stdout, "<oracles@base>", "exec"), ns)
        old = ns["ORACLES"]
    except Exception:
        return set(ORACLES)
    return {k for k, v in ORACLES.items() if old.get(k) != v}


def touched_queries(base: str | None = None) -> list[str]:
    """Registry entries touched since ``base`` (see module docstring)."""
    import ast
    import inspect
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    base = base or _last_round_commit()
    changed_files = subprocess.run(
        ["git", "diff", "--name-only", base, "HEAD", "--", "pipelines_spark/"],
        capture_output=True,
        text=True,
        cwd=repo,
        check=True,
    ).stdout.split()
    touched: set[str] = set()

    def spans(path: str) -> list[tuple[str, int, int]]:
        tree = ast.parse(open(os.path.join(repo, path)).read())
        return [
            (node.name, node.lineno, node.end_lineno or node.lineno)
            for node in tree.body
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef))
        ]

    if "pipelines_spark/queries.py" in changed_files:
        lines = _changed_lines(base, "pipelines_spark/queries.py")
        for name, lo, hi in spans("pipelines_spark/queries.py"):
            if name in QUERIES and lines & set(range(lo, hi + 1)):
                touched.add(name)
    # oracles.py holds ORACLES as ONE dict literal (no per-query
    # defs), so span mapping can't see entry edits (r11 ADVICE):
    # instead replay the base revision and diff the RENDERED SQL per
    # key — which also selects every entry fed by an edited helper
    # CTE/constant (e.g. _PQ_ADC_CTES), not just dict-literal lines.
    if "pipelines_spark/oracles.py" in changed_files:
        touched |= _oracle_entries_changed(base, repo)
    # Any OTHER changed pipelines_spark module: every query whose
    # function source mentions the module's basename is touched.
    other = [
        f
        for f in changed_files
        if f.endswith(".py")
        and f not in ("pipelines_spark/queries.py", "pipelines_spark/oracles.py")
    ]
    for path in other:
        stem = os.path.splitext(os.path.basename(path))[0]
        for name, fn in QUERIES.items():
            try:
                src = inspect.getsource(fn)
            except (OSError, TypeError):  # pragma: no cover - builtins
                continue
            if stem in src:
                touched.add(name)
    return sorted(touched)


def main() -> int:
    args = sys.argv[1:]
    if args and args[0] == "--touched":
        names = touched_queries(args[1] if len(args) > 1 else None)
        if not names:
            print("touched: none — no registry entries changed since base")
            return 0
        print(f"touched ({len(names)}): {' '.join(names)}")
    else:
        names = args or list(QUERIES)
    spark = get_spark("parity_check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    failures = 0
    for name in names:
        try:
            sdf = QUERIES[name](spark, SF_DIR)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
            res = con.execute(ORACLES[name])
            o_cols = [d[0] for d in res.description]
            o_rows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            failures += 1
            continue
        ok_rows = len(s_rows) == len(o_rows)
        ok_cols = sorted(s_cols) == sorted(o_cols)
        s_idx = [s_cols.index(c) for c in sorted(s_cols)]
        o_idx = [o_cols.index(c) for c in sorted(o_cols)]
        s_set = sorted(tuple(_canon(r[i]) for i in s_idx) for r in s_rows)
        o_set = sorted(tuple(_canon(r[i]) for i in o_idx) for r in o_rows)
        ok_vals = s_set == o_set
        status = "ok" if (ok_rows and ok_cols and ok_vals) else "FAIL"
        if status == "FAIL":
            failures += 1
            print(
                f"{status} {name}: rows {len(s_rows)}/{len(o_rows)} "
                f"cols_match={ok_cols} vals_match={ok_vals}"
            )
            if not ok_cols:
                print(f"  spark cols: {s_cols}\n  oracle cols: {o_cols}")
            if ok_cols and not ok_vals:
                diff_s = [r for r in s_set if r not in set(o_set)][:3]
                diff_o = [r for r in o_set if r not in set(s_set)][:3]
                print(f"  spark-only: {diff_s}\n  oracle-only: {diff_o}")
        else:
            print(f"ok {name}: {len(s_rows)} rows")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
