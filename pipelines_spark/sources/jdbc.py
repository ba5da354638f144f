"""JDBC sources (SURVEY S1/S2, F6, O3).

The reference hand-rolls DB capture: cursor batches of 50k rows
(pipelines/utils/dump_db/db.py:87-321), LIMIT/OFFSET paging
(pipelines/rj_smtr/utils.py:831-910), and a partition-date CTE rewrite
for incremental pushdown (pipelines/utils/dump_db/tasks.py:182-259).

Spark-native: one partitioned JDBC read replaces the batch loop and
the thread pipeline — executors fetch ranges in parallel and the
incremental predicate ships inside the pushdown subquery. This module
builds the reader configuration; it is exercised against a live DBMS
(no JDBC driver ships in this environment, so tests cover the option
construction and query rewriting).
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession

DEFAULT_FETCH_SIZE = 50_000  # the reference's batch_size contract
DEFAULT_NUM_PARTITIONS = 32

_URL_TEMPLATES = {
    "postgresql": "jdbc:postgresql://{host}:{port}/{database}",
    "mysql": "jdbc:mysql://{host}:{port}/{database}",
    "sqlserver": "jdbc:sqlserver://{host}:{port};databaseName={database}",
    "oracle": "jdbc:oracle:thin:@{host}:{port}/{database}",
    # embedded Apache Derby (ships on the Spark classpath) — used by
    # the integration test to exercise the real JDBC path end-to-end
    "derby": "jdbc:derby:{database}",
}


@dataclass
class JdbcSource:
    db_type: str
    host: str
    port: int
    database: str
    user: str
    password: str

    @property
    def url(self) -> str:
        return _URL_TEMPLATES[self.db_type].format(
            host=self.host, port=self.port, database=self.database
        )


def incremental_query(
    base_query: str,
    partition_column: str,
    lower_bound: datetime | str | None,
    *,
    db_type: str = "postgresql",
) -> str:
    """Wrap ``base_query`` in a CTE and append the incremental
    predicate — the reference's partition-pruning rewrite
    (format_partitioned_query), expressed once for all DB dialects.
    """
    if lower_bound is None:
        return base_query
    bound = lower_bound.isoformat(sep=" ") if isinstance(lower_bound, datetime) else str(lower_bound)
    if db_type == "oracle":
        predicate = (
            f"{partition_column} >= TO_DATE('{bound}', 'YYYY-MM-DD HH24:MI:SS')"
        )
    elif db_type == "derby":
        # Derby needs an explicit TIMESTAMP() constructor for
        # string-vs-timestamp comparison
        predicate = f"{partition_column} >= TIMESTAMP('{bound}')"
    else:
        predicate = f"{partition_column} >= '{bound}'"
    body = base_query.rstrip().rstrip(";")
    if db_type == "derby":
        # Derby has no WITH clause — same rewrite as a derived table
        return f"SELECT * FROM ({body}) q WHERE {predicate}"
    return f"WITH q AS ({body}) SELECT * FROM q WHERE {predicate}"


def reader_options(
    source: JdbcSource,
    query: str,
    *,
    partition_column: str | None = None,
    lower_bound: str | int | None = None,
    upper_bound: str | int | None = None,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    fetch_size: int = DEFAULT_FETCH_SIZE,
) -> dict[str, str]:
    """Spark JDBC reader options for a parallel partitioned scan.

    With ``partition_column`` + bounds, Spark splits the scan into
    ``num_partitions`` concurrent range queries — replacing the
    reference's manual 50k-row cursor loop *and* its id-paging
    (O3/T7): bounds come from the watermark store.
    """
    opts = {
        "url": source.url,
        "user": source.user,
        "password": source.password,
        "dbtable": f"({query}) AS src",
        "fetchsize": str(fetch_size),
    }
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned JDBC read needs lower/upper bounds")
        opts.update(
            {
                "partitionColumn": partition_column,
                "lowerBound": str(lower_bound),
                "upperBound": str(upper_bound),
                "numPartitions": str(num_partitions),
            }
        )
    return opts


def read_jdbc(spark: SparkSession, options: dict[str, str]) -> DataFrame:
    return spark.read.format("jdbc").options(**options).load()
