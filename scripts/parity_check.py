"""Quick standalone parity check for a subset of queries: run the
Spark query and the DuckDB oracle side by side at a given sf_dir and
compare rows/columns/values (order-insensitive), mirroring the
driver's gate. Usage:

    python scripts/parity_check.py q1_pricing_summary t3_sliding_window ...

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


def main() -> int:
    names = sys.argv[1:] or list(QUERIES)
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
