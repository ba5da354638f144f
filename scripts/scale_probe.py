"""Scale probe: replicate sf0.1 tables 10x (key-offset copies) into a
synthetic ~sf1 directory and compare headline query wall-clock vs
sf0.1. Evidence for docs/SCALE.md that the plans scale ~linearly —
a quadratic operator shows up as a >>10x ratio immediately.

Usage: python scripts/scale_probe.py [n_copies] [out_dir]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

# key columns offset per copy; the stride is computed from the actual
# max key value of the source table (max+1), so copies stay
# collision-free at ANY scale factor, not just sf0.1
KEY_COLUMNS = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    # dims stay single-copy
}

PROBE_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "a3_latest_event_per_user",
    "w6_sessionize",
    "j11_asof_enrichment",
    "embed_ivf_ann",
    "text_quality_by_source",
]


def replicate(table: str, out_dir: Path, n: int, src: str = SRC) -> None:
    t = pq.read_table(f"{src}/{table}.parquet")
    key_cols = KEY_COLUMNS.get(table, [])
    strides = {
        name: int(pc.max(t[name]).as_py() or 0) + 1 for name in key_cols
    }
    if not strides or n == 1:
        parts = [t] * (n if strides else 1)
    else:
        parts = []
        for i in range(n):
            cols = []
            for name in t.column_names:
                col = t[name]
                if name in strides and i > 0:
                    col = pc.add(col, strides[name] * i)
                cols.append(col)
            parts.append(pa.table(dict(zip(t.column_names, cols))))
    pq.write_table(pa.concat_tables(parts), out_dir / f"{table}.parquet")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfprobe")
    out_dir.mkdir(parents=True, exist_ok=True)
    for table in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        replicate(table, out_dir, n)

    from pipelines_spark.queries import QUERIES
    from pipelines_spark.session import get_spark

    spark = get_spark("scale_probe")

    def best_of_2(name: str, sf_dir: str) -> float:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        return best

    print(f"{'query':32s} {'sf0.1':>8s} {f'x{n}':>8s} {'ratio':>6s}")
    for name in PROBE_QUERIES:
        base = best_of_2(name, SRC)
        big = best_of_2(name, str(out_dir))
        print(f"{name:32s} {base:8.2f} {big:8.2f} {big / base:6.1f}")
    spark.stop()


if __name__ == "__main__":
    main()
