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

# Key DOMAINS offset per copy. Columns sharing a domain (PK and its
# FKs) must share ONE stride — independently-computed per-column
# strides would misalign foreign keys across copies whenever the max
# referenced key has no referencing row (e.g. an orderless customer),
# silently breaking join cardinalities. The stride is the max over
# every column in the domain, +1 — collision-free at any scale
# factor AND FK-consistent.
KEY_DOMAINS = {
    "orderkey": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "custkey": [("customer", "c_custkey"), ("orders", "o_custkey")],
    "event_id": [("events", "event_id")],
    "user_id": [("events", "user_id")],
    "doc_id": [("documents", "doc_id")],
    "vec_id": [("embeddings", "vec_id")],
    # dims stay single-copy
}


def domain_strides(src: str) -> dict[tuple[str, str], int]:
    """(table, column) -> per-copy offset, one shared stride per
    key domain."""
    out: dict[tuple[str, str], int] = {}
    for cols in KEY_DOMAINS.values():
        stride = 0
        for table, col in cols:
            t = pq.read_table(f"{src}/{table}.parquet", columns=[col])
            stride = max(stride, int(pc.max(t[col]).as_py() or 0) + 1)
        for table, col in cols:
            out[(table, col)] = stride
    return out

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


def replicate(
    table: str,
    out_dir: Path,
    n: int,
    src: str = SRC,
    strides_by_col: dict[tuple[str, str], int] | None = None,
) -> None:
    t = pq.read_table(f"{src}/{table}.parquet")
    if strides_by_col is None:
        strides_by_col = domain_strides(src)
    strides = {
        col: stride
        for (tbl, col), stride in strides_by_col.items()
        if tbl == table
    }
    if not strides or n == 1:
        parts = [t] * (n if strides else 1)
    else:
        parts = []
        for i in range(n):
            cols = []
            for name in t.column_names:
                col = t[name]
                if i > 0 and name in strides:
                    col = pc.add(col, strides[name] * i)
                elif i > 0 and table == "documents" and name == "text":
                    # make each copy's shingle set disjoint from every
                    # other copy's: verbatim text replicas are EXACT
                    # duplicates, so dedup operators would (correctly)
                    # emit C(n,2)/n x more pairs per doc — quadratic
                    # OUTPUT growth that masquerades as a quadratic
                    # PLAN in the ratio. Tagging every word keeps doc
                    # length/shape while scaling true pairs linearly.
                    col = pc.replace_substring_regex(
                        col, r"(\w+)", rf"c{i}\1"
                    )
                cols.append(col)
            parts.append(pa.table(dict(zip(t.column_names, cols))))
    pq.write_table(pa.concat_tables(parts), out_dir / f"{table}.parquet")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfprobe")
    out_dir.mkdir(parents=True, exist_ok=True)
    strides = domain_strides(SRC)
    for table in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        replicate(table, out_dir, n, strides_by_col=strides)

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
