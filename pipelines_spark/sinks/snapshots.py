"""Snapshot table format: a manifest-log over plain parquet files
giving atomic commits, time travel, and incremental change reads.

Why this exists (reference parity + scale): the reference's
exactly-once-ish contract is partition-level replace with
same-filename uploads (pipelines/utils/tasks.py:273-276,
pipelines/utils/dump_db/tasks.py:401-435) — readers racing a re-upload
can observe a half-replaced partition, and there is no way to read
"the table as of yesterday's run" or "only what the last run added".
At 100 TB those gaps dominate: a 1000-executor scan that starts
mid-overwrite reads a torn table, and every incremental consumer
re-lists millions of files. The fix is the same one Delta/Iceberg
made standard, reduced to its core:

- data files are immutable; a write job lands files under a unique
  ``data/…`` subdirectory, invisible to readers;
- a table VERSION is a manifest (JSON in ``_log/``) listing the exact
  files of that snapshot — readers never list directories, they read
  the manifest (O(1) listing at any file count) and hand Spark the
  explicit file list;
- commit = one atomic rename of the manifest into place. Rename
  fails if the destination exists, which doubles as optimistic
  concurrency control: two racing committers produce one winner and
  one clean ``CommitConflict`` (retry re-reads the log). Readers see
  the old complete snapshot or the new complete snapshot, never a
  mix;
- time travel = read an older manifest; incremental consumption =
  union of files ADDED by manifests in ``(since, to]`` — the
  streaming-ish "what changed" read without a streaming source;
- ``expire_snapshots`` drops old manifests and deletes data files no
  retained snapshot references (storage reclaim with a bounded
  time-travel window).

All filesystem access goes through the Hadoop FileSystem API, so the
same code runs on file:// and hdfs:// (HDFS rename is atomic and
fails on existing destinations). On S3-style stores without atomic
rename, front the log with a coordinating catalog — documented, not
silently wrong.
"""

from __future__ import annotations

import json
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_LOG_DIR = "_log"
_DATA_DIR = "data"


class CommitConflict(RuntimeError):
    """Another writer committed this version first; re-read the log
    and retry."""


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), jvm


def _hp(jvm, path: str):
    return jvm.org.apache.hadoop.fs.Path(path)


def _write_text(fs, jvm, path: str, text: str) -> None:
    out = fs.create(_hp(jvm, path), True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def _read_text(fs, jvm, path: str) -> str:
    # py4j passes bytearrays by value, so stream.read(buf) can't fill a
    # Python buffer — drain the stream JVM-side instead
    stream = fs.open(_hp(jvm, path))
    try:
        return jvm.org.apache.commons.io.IOUtils.toString(
            stream, jvm.java.nio.charset.StandardCharsets.UTF_8
        )
    finally:
        stream.close()


def _manifest_name(version: int) -> str:
    return f"v{version:08d}.json"


def _list_versions(fs, jvm, log_dir: str) -> list[int]:
    if not fs.exists(_hp(jvm, log_dir)):
        return []
    versions = []
    for status in fs.listStatus(_hp(jvm, log_dir)):
        name = status.getPath().getName()
        if name.startswith("v") and name.endswith(".json"):
            try:
                versions.append(int(name[1:-5]))
            except ValueError:
                continue
    return sorted(versions)


def _load_manifest(fs, jvm, log_dir: str, version: int) -> dict:
    return json.loads(_read_text(fs, jvm, f"{log_dir}/{_manifest_name(version)}"))


def _data_files(fs, jvm, directory: str) -> list[str]:
    """Relative paths (from the table root) of the parquet files a
    write job produced under ``directory``."""
    out = []
    it = fs.listFiles(_hp(jvm, directory), True)
    while it.hasNext():
        status = it.next()
        p = status.getPath().toUri().getPath()
        if p.endswith(".parquet"):
            out.append(p)
    return sorted(out)


def current_version(spark: SparkSession, path: str) -> int | None:
    """Latest committed version, or None for a non-existent table."""
    fs, jvm = _fs(spark, path)
    versions = _list_versions(fs, jvm, f"{path}/{_LOG_DIR}")
    return versions[-1] if versions else None


def _latest_txn_batch(fs, jvm, log_dir: str, versions: list[int], app_id: str):
    """Highest batch id any retained manifest committed for
    ``app_id`` (None if the app never committed). Chain walk — O(log
    length); a production table format folds this into the latest
    manifest, but the walk stays correct across interleaved merge/
    compact/delete commits without threading txn state through every
    commit path."""
    best = None
    for v in versions:
        t = _load_manifest(fs, jvm, log_dir, v).get("txn")
        if t and t.get("app") == app_id:
            best = t["batch"] if best is None else max(best, t["batch"])
    return best


def snapshot_write(
    spark: SparkSession,
    path: str,
    df: DataFrame,
    *,
    mode: str = "append",
    clock=time.time,
    max_retries: int = 3,
    txn: tuple[str, int] | None = None,
) -> int | None:
    """Commit ``df`` as a new snapshot of the table at ``path``.

    ``mode='append'``: the new snapshot is the previous file set plus
    this write's files. ``mode='overwrite'``: the new snapshot is
    exactly this write's files (old files stay on disk for time
    travel until ``expire_snapshots``).

    The data job runs FIRST, into a unique uncommitted directory; the
    commit is a single manifest rename afterwards. A crash between
    the two leaves orphan data files (cleaned by ``expire_snapshots``)
    and no visible change. Returns the committed version number.

    ``txn=(app_id, batch_id)`` makes the commit IDEMPOTENT per
    (app, batch) — the exactly-once contract Structured Streaming's
    ``foreachBatch`` needs on task/epoch retry: a batch whose id is
    <= the app's highest committed batch is skipped (returns None,
    nothing becomes visible; the orphaned staged files are swept by
    ``expire_snapshots``). The check re-runs inside the commit-race
    retry loop, so two racing replays of the same batch still commit
    once. Caveat shared with every txn-log design: ``expire_snapshots``
    dropping a manifest older than the app's last batch forgets that
    batch id — keep the retention window longer than the longest
    possible replay gap.

    ``clock`` is injectable (engine-wide determinism contract —
    SURVEY "non-determinism in the reference") so time-travel tests
    replay exactly.
    """
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    fs, jvm = _fs(spark, path)
    log_dir = f"{path}/{_LOG_DIR}"
    fs.mkdirs(_hp(jvm, log_dir))

    if txn is not None:
        # cheap pre-check BEFORE the write job: a replayed batch skips
        # the data write entirely, not just the commit
        done = _latest_txn_batch(
            fs, jvm, log_dir, _list_versions(fs, jvm, log_dir), txn[0]
        )
        if done is not None and txn[1] <= done:
            return None

    write_id = uuid.uuid4().hex[:12]
    data_dir = f"{path}/{_DATA_DIR}/w-{write_id}"
    df.write.mode("error").parquet(data_dir)
    root_prefix = _hp(jvm, path).toUri().getPath().rstrip("/") + "/"
    added = [
        p[len(root_prefix):] if p.startswith(root_prefix) else p
        for p in _data_files(fs, jvm, data_dir)
    ]

    for _attempt in range(max_retries):
        versions = _list_versions(fs, jvm, log_dir)
        if txn is not None:
            # authoritative re-check under the current log head: the
            # loser of a same-batch race lands here after its rename
            # fails and must NOT commit a duplicate
            done = _latest_txn_batch(fs, jvm, log_dir, versions, txn[0])
            if done is not None and txn[1] <= done:
                return None
        prev = versions[-1] if versions else None
        if mode == "append" and prev is not None:
            prev_m = _load_manifest(fs, jvm, log_dir, prev)
            base = prev_m["files"]
            # additive evolution only: new columns may appear, but a
            # column the table already has must keep its name AND
            # type — a silently dropped or retyped column would make
            # the latest schema misread every older file
            prev_schema = StructType.fromJson(json.loads(prev_m["schema"]))
            new_fields = {f.name: f.dataType for f in df.schema.fields}
            bad = [
                f"{f.name} ({f.dataType.simpleString()} -> "
                f"{new_fields[f.name].simpleString() if f.name in new_fields else 'MISSING'})"
                for f in prev_schema.fields
                if f.name not in new_fields or new_fields[f.name] != f.dataType
            ]
            if bad:
                raise ValueError(
                    f"append schema incompatible with table {path}: "
                    f"{', '.join(bad)}; only additive column changes are "
                    "allowed on append (use mode='overwrite' to redefine)"
                )
        else:
            base = []
        version = (prev or 0) + 1
        manifest = {
            "version": version,
            "parent": prev,
            "operation": mode,
            "committed_at": float(clock()),
            "schema": df.schema.json(),
            "added": added,
            "files": base + added,
        }
        if txn is not None:
            manifest["txn"] = {"app": txn[0], "batch": txn[1]}
        tmp = f"{log_dir}/_tmp-{uuid.uuid4().hex}.json"
        _write_text(fs, jvm, tmp, json.dumps(manifest))
        # rename-if-absent IS the commit: exactly one of two racing
        # writers wins the destination name
        if fs.rename(_hp(jvm, tmp), _hp(jvm, f"{log_dir}/{_manifest_name(version)}")):
            return version
        fs.delete(_hp(jvm, tmp), False)
    raise CommitConflict(
        f"lost the commit race {max_retries} times at {path} "
        f"(last attempted version {version})"
    )


def _resolve_version(
    fs, jvm, log_dir: str, version: int | None, as_of: float | None
) -> int:
    versions = _list_versions(fs, jvm, log_dir)
    if not versions:
        raise FileNotFoundError(f"no snapshot log at {log_dir}")
    if version is not None:
        if version not in versions:
            raise ValueError(f"version {version} not in log (have {versions})")
        return version
    if as_of is not None:
        eligible = [
            v for v in versions
            if _load_manifest(fs, jvm, log_dir, v)["committed_at"] <= as_of
        ]
        if not eligible:
            raise ValueError(f"no snapshot committed at or before {as_of}")
        return eligible[-1]
    return versions[-1]


def snapshot_read(
    spark: SparkSession,
    path: str,
    *,
    version: int | None = None,
    as_of: float | None = None,
) -> DataFrame:
    """Read a snapshot: latest by default, else an explicit
    ``version`` or the newest one committed at-or-before ``as_of``
    (unix seconds). The scan gets the manifest's explicit file list —
    no directory listing, no chance of seeing uncommitted files."""
    fs, jvm = _fs(spark, path)
    log_dir = f"{path}/{_LOG_DIR}"
    v = _resolve_version(fs, jvm, log_dir, version, as_of)
    manifest = _load_manifest(fs, jvm, log_dir, v)
    schema = StructType.fromJson(json.loads(manifest["schema"]))
    files = [f"{path}/{f}" for f in manifest["files"]]
    if not files:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(*files)


def snapshot_changes(
    spark: SparkSession,
    path: str,
    *,
    since_version: int,
    to_version: int | None = None,
) -> DataFrame:
    """Rows ADDED by commits in ``(since_version, to_version]`` — the
    incremental-consumption read (SURVEY T2's "start where the last
    materialization ended" as a table-level primitive). An overwrite
    commit contributes its full new file set, matching
    overwrite-as-reload semantics."""
    fs, jvm = _fs(spark, path)
    log_dir = f"{path}/{_LOG_DIR}"
    versions = _list_versions(fs, jvm, log_dir)
    if to_version is None:
        to_version = versions[-1] if versions else since_version
    files: list[str] = []
    schema_json = None
    for v in versions:
        if since_version < v <= to_version:
            m = _load_manifest(fs, jvm, log_dir, v)
            schema_json = m["schema"]
            if m["operation"] in ("compact", "delete"):
                # file-level rewrites (no new rows) — replaying their
                # 'added' files would duplicate surviving rows
                # downstream; deletes additionally need retraction
                # semantics no append-only consumer has
                continue
            files.extend(m["added"])
    if schema_json is None:
        latest = snapshot_read(spark, path)
        return spark.createDataFrame([], latest.schema)
    schema = StructType.fromJson(json.loads(schema_json))
    if not files:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(*[f"{path}/{f}" for f in files])


def snapshot_history(spark: SparkSession, path: str) -> list[dict]:
    """Commit log, oldest first: version, parent, operation,
    committed_at, n_files, n_added."""
    fs, jvm = _fs(spark, path)
    log_dir = f"{path}/{_LOG_DIR}"
    out = []
    for v in _list_versions(fs, jvm, log_dir):
        m = _load_manifest(fs, jvm, log_dir, v)
        out.append(
            {
                "version": m["version"],
                "parent": m["parent"],
                "operation": m["operation"],
                "committed_at": m["committed_at"],
                "n_files": len(m["files"]),
                "n_added": len(m["added"]),
            }
        )
    return out


def expire_snapshots(
    spark: SparkSession, path: str, *, keep_last: int = 1
) -> dict[str, int]:
    """Drop all but the newest ``keep_last`` manifests and delete
    every data file no retained manifest references (including orphans
    from crashed writes). Bounds the time-travel window and reclaims
    storage; the manifest-listed live set is untouched, so concurrent
    readers of retained versions are safe. Returns counts."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    fs, jvm = _fs(spark, path)
    log_dir = f"{path}/{_LOG_DIR}"
    versions = _list_versions(fs, jvm, log_dir)
    retained = versions[-keep_last:]
    live: set[str] = set()
    for v in retained:
        live.update(_load_manifest(fs, jvm, log_dir, v)["files"])

    removed_files = 0
    data_root = f"{path}/{_DATA_DIR}"
    if fs.exists(_hp(jvm, data_root)):
        root_prefix = _hp(jvm, path).toUri().getPath().rstrip("/") + "/"
        for abs_path in _data_files(fs, jvm, data_root):
            rel = abs_path[len(root_prefix):] if abs_path.startswith(root_prefix) else abs_path
            if rel not in live:
                fs.delete(_hp(jvm, f"{path}/{rel}"), False)
                removed_files += 1
        # sweep write directories holding no live files (only
        # _SUCCESS/.crc markers remain after the deletes above) so
        # listing stays O(live)
        live_dirs = {rel.split("/", 2)[1] for rel in live if rel.startswith(f"{_DATA_DIR}/")}
        for status in fs.listStatus(_hp(jvm, data_root)):
            if status.isDirectory() and status.getPath().getName() not in live_dirs:
                fs.delete(status.getPath(), True)

    removed_manifests = 0
    for v in versions:
        if v not in retained:
            fs.delete(_hp(jvm, f"{log_dir}/{_manifest_name(v)}"), False)
            removed_manifests += 1
    return {"manifests_removed": removed_manifests, "data_files_removed": removed_files}


# --------------------------------------------------------------- file stats

#: columns eligible for manifest stats (orderable primitives)
_STAT_TYPES = ("int", "bigint", "long", "double", "float", "date", "timestamp", "string", "smallint", "tinyint", "decimal")


def _collect_file_stats(files: list[str], stat_cols: list[str]) -> dict:
    """Per-file min/max for ``stat_cols`` from parquet footers — the
    write job already computed these; reading footers is O(files),
    zero data scanned."""
    import pyarrow.parquet as pq

    stats: dict[str, dict] = {}
    for f in files:
        md = pq.ParquetFile(f).metadata
        names = md.schema.names
        per_col = {}
        for c in stat_cols:
            if c not in names:
                continue
            idx = names.index(c)
            lo = hi = None
            ok = True
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                if st is None or not st.has_min_max:
                    ok = False
                    break
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            if ok and lo is not None:
                per_col[c] = [_json_safe(lo), _json_safe(hi)]
        stats[f] = per_col
    return stats


def _json_safe(v):
    import datetime

    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.decode("utf-8", "replace")
    return v


def snapshot_write_with_stats(
    spark: SparkSession,
    path: str,
    df: DataFrame,
    *,
    mode: str = "append",
    stat_cols: list[str] | None = None,
    clock=time.time,
    max_retries: int = 3,
) -> int:
    """``snapshot_write`` + per-file column min/max recorded in the
    manifest (Iceberg-style manifest pruning): a filtered
    ``snapshot_read_pruned`` then skips whole FILES from the manifest
    alone — before Spark even plans the scan. At 100 TB the difference
    between 'list a few hundred candidate files' and 'hand the
    planner a million paths and let footer-skipping sort it out' is
    driver memory and planning time, not just I/O.

    Stats default to every orderable primitive column. Local-scheme
    stats collection uses pyarrow on the committed files; the write
    path is otherwise identical to ``snapshot_write``.
    """
    if stat_cols is None:
        stat_cols = [
            f.name
            for f in df.schema.fields
            if f.dataType.simpleString().split("(")[0] in _STAT_TYPES
        ]
    version = snapshot_write(
        spark, path, df, mode=mode, clock=clock, max_retries=max_retries
    )
    # enrich the just-committed manifest (idempotent same-file rewrite
    # AFTER the rename won: the version is already durable)
    fs, jvm = _fs(spark, path)
    log_dir = f"{path}/{_LOG_DIR}"
    manifest = _load_manifest(fs, jvm, log_dir, version)
    abs_added = [f"{path}/{rel}" for rel in manifest["added"]]
    file_stats = _collect_file_stats(abs_added, stat_cols)
    manifest["stats"] = {
        rel: file_stats.get(f"{path}/{rel}", {}) for rel in manifest["added"]
    }
    _write_text(fs, jvm, f"{log_dir}/{_manifest_name(version)}", json.dumps(manifest))
    return version


def snapshot_read_pruned(
    spark: SparkSession,
    path: str,
    *,
    col: str,
    lo=None,
    hi=None,
    version: int | None = None,
) -> DataFrame:
    """Read only the files whose manifest ``col`` range intersects
    ``[lo, hi]`` (either bound optional). Files without recorded stats
    for ``col`` are conservatively kept. The residual predicate is
    still applied — pruning is an optimization, never a filter."""
    from pyspark.sql import functions as F

    fs, jvm = _fs(spark, path)
    log_dir = f"{path}/{_LOG_DIR}"
    v = _resolve_version(fs, jvm, log_dir, version, None)
    # stats live on the manifest that ADDED each file; walk the chain
    stats: dict[str, list] = {}
    for ver in _list_versions(fs, jvm, log_dir):
        if ver <= v:
            m = _load_manifest(fs, jvm, log_dir, ver)
            stats.update(m.get("stats", {}))
    manifest = _load_manifest(fs, jvm, log_dir, v)
    schema = StructType.fromJson(json.loads(manifest["schema"]))

    def keep(rel: str) -> bool:
        rng = stats.get(rel, {}).get(col)
        if not rng:
            return True
        mn, mx = rng
        if lo is not None and mx < lo:
            return False
        if hi is not None and mn > hi:
            return False
        return True

    files = [f"{path}/{rel}" for rel in manifest["files"] if keep(rel)]
    if not files:
        return spark.createDataFrame([], schema)
    out = spark.read.schema(schema).parquet(*files)
    if lo is not None:
        out = out.filter(F.col(col) >= F.lit(lo))
    if hi is not None:
        out = out.filter(F.col(col) <= F.lit(hi))
    return out


# ---------------------------------------------------------- merge / compact

def snapshot_merge(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    keys: list[str],
    *,
    clock=time.time,
) -> dict:
    """Row-grain MERGE into a snapshot table (matched → replace row,
    unmatched → insert), committed as one new version: readers see the
    pre-merge or post-merge table, never a mix — the torn-read window
    the Hive-layout ``merge_upsert`` closes with staged dynamic
    overwrite simply does not exist here.

    Copy-on-write at snapshot grain (the whole surviving file set is
    rewritten). For huge tables where merges touch few rows, pair the
    table with partition columns and use ``merge_upsert`` on a Hive
    layout instead — or prune the rewrite set with manifest stats; the
    contract here is correctness-first. Returns {"version",
    "rows_upserted"}.
    """
    current = snapshot_read(spark, path)
    if set(current.columns) != set(updates.columns):
        raise ValueError(
            f"updates schema {sorted(updates.columns)} != table schema "
            f"{sorted(current.columns)}"
        )
    survivors = current.join(
        updates.select(*keys).distinct(), keys, "left_anti"
    ).select(*updates.columns)
    merged = survivors.unionByName(updates)
    version = snapshot_write(spark, path, merged, mode="overwrite", clock=clock)
    return {"version": version, "rows_upserted": updates.count()}


def compact_snapshot(
    spark: SparkSession,
    path: str,
    *,
    target_files: int = 8,
    sort_cols: list[str] | None = None,
    stat_cols: list[str] | None = None,
    clock=time.time,
) -> dict:
    """Rewrite the current snapshot into ``target_files`` files and
    commit it with operation='compact' — a FILE-LEVEL rewrite that
    changes no rows. Change consumers must not replay it:
    ``snapshot_changes`` and the snapshot_table stream SKIP compact
    commits (their 'added' files are rewrites of already-delivered
    rows), and incremental rollups treat them as empty deltas. Old
    small files stay readable for time travel until
    ``expire_snapshots``. Returns {"version", "files_before",
    "files_after"}.

    The rewrite re-collects manifest min/max stats (``stat_cols``,
    default: every orderable primitive) so ``snapshot_read_pruned``
    keeps working on the compacted file set — a compaction that
    silently discarded stats would turn every pruned read into a full
    scan. ``sort_cols`` additionally range-partitions + sorts the
    rewrite (the OPTIMIZE-and-cluster move): each compacted file owns
    a disjoint range of the sort key, so stat pruning on that key hits
    single files. Per-file Bloom filters are NOT carried through a
    compact (rebuild with ``snapshot_write_with_blooms`` if point
    lookups matter post-compaction)."""
    from pyspark.sql import functions as F  # noqa: F401 (column refs)

    fs, jvm = _fs(spark, path)
    log_dir = f"{path}/{_LOG_DIR}"
    head = _resolve_version(fs, jvm, log_dir, None, None)
    files_before = len(_load_manifest(fs, jvm, log_dir, head)["files"])
    df = snapshot_read(spark, path, version=head)
    if sort_cols:
        df = df.repartitionByRange(target_files, *sort_cols).sortWithinPartitions(
            *sort_cols
        )
    else:
        df = df.coalesce(target_files)
    version = snapshot_write_with_stats(
        spark, path, df, mode="overwrite", stat_cols=stat_cols, clock=clock
    )
    # stamp the true operation (the rename already won; same-file
    # rewrite of the committed manifest is idempotent)
    manifest = _load_manifest(fs, jvm, log_dir, version)
    manifest["operation"] = "compact"
    _write_text(fs, jvm, f"{log_dir}/{_manifest_name(version)}", json.dumps(manifest))
    files_after = len(manifest["files"])
    return {"version": version, "files_before": files_before, "files_after": files_after}


def snapshot_delete_where(
    spark: SparkSession,
    path: str,
    predicate,
    *,
    prune_col: str | None = None,
    prune_lo=None,
    prune_hi=None,
    clock=time.time,
) -> dict:
    """File-level copy-on-write DELETE: rows matching ``predicate`` (a
    Column) are removed by rewriting ONLY the files that can contain
    them; untouched files carry over into the new version unread and
    unmoved.

    ``prune_col``/``prune_lo``/``prune_hi`` select the candidate set
    from manifest stats (files whose recorded [min,max] intersects the
    range); without them, or for stat-less files, every file is a
    candidate. The predicate is always applied exactly — pruning only
    bounds the REWRITE I/O: a retention delete on a time column
    rewrites days, not the table.

    Concurrency: the commit must land directly on the version that was
    read (its file set is the carry-over base); if another writer
    commits in between, ``CommitConflict`` is raised — re-run against
    the new head rather than silently dropping the racer's files.

    The commit records operation='delete'. Change-feed consumers skip
    it (its 'added' files are rewrites of surviving rows — replaying
    them would duplicate), and incremental rollups reject the range
    (rows changed non-monotonically) — rebuild or re-window instead.

    Returns {"version", "rows_deleted", "files_rewritten",
    "files_kept"}.
    """
    from pyspark.sql import functions as F  # noqa: F401 (predicate helpers)

    fs, jvm = _fs(spark, path)
    log_dir = f"{path}/{_LOG_DIR}"
    head = _resolve_version(fs, jvm, log_dir, None, None)
    manifest = _load_manifest(fs, jvm, log_dir, head)
    schema = StructType.fromJson(json.loads(manifest["schema"]))

    stats: dict[str, dict] = {}
    for ver in _list_versions(fs, jvm, log_dir):
        if ver <= head:
            stats.update(_load_manifest(fs, jvm, log_dir, ver).get("stats", {}))

    def is_candidate(rel: str) -> bool:
        if prune_col is None:
            return True
        rng = stats.get(rel, {}).get(prune_col)
        if not rng:
            return True
        mn, mx = rng
        if prune_lo is not None and mx < prune_lo:
            return False
        if prune_hi is not None and mn > prune_hi:
            return False
        return True

    candidates = [rel for rel in manifest["files"] if is_candidate(rel)]
    kept = [rel for rel in manifest["files"] if rel not in set(candidates)]

    if not candidates:
        return {
            "version": head, "rows_deleted": 0,
            "files_rewritten": 0, "files_kept": len(kept),
        }

    cand_df = spark.read.schema(schema).parquet(
        *[f"{path}/{rel}" for rel in candidates]
    )
    survivors = cand_df.filter(~predicate)
    n_before = cand_df.count()

    write_id = uuid.uuid4().hex[:12]
    data_dir = f"{path}/{_DATA_DIR}/w-{write_id}"
    survivors.write.mode("error").parquet(data_dir)
    root_prefix = _hp(jvm, path).toUri().getPath().rstrip("/") + "/"
    added = [
        p[len(root_prefix):] if p.startswith(root_prefix) else p
        for p in _data_files(fs, jvm, data_dir)
    ]
    n_after = spark.read.schema(schema).parquet(
        *[f"{path}/{rel}" for rel in added]
    ).count() if added else 0

    new_stats = {}
    if prune_col is not None and added:
        file_stats = _collect_file_stats(
            [f"{path}/{rel}" for rel in added], [prune_col]
        )
        new_stats = {rel: file_stats.get(f"{path}/{rel}", {}) for rel in added}

    version = head + 1
    new_manifest = {
        "version": version,
        "parent": head,
        "operation": "delete",
        "committed_at": float(clock()),
        "schema": manifest["schema"],
        "added": added,
        "files": kept + added,
        "stats": new_stats,
    }
    tmp = f"{log_dir}/_tmp-{uuid.uuid4().hex}.json"
    _write_text(fs, jvm, tmp, json.dumps(new_manifest))
    if not fs.rename(_hp(jvm, tmp), _hp(jvm, f"{log_dir}/{_manifest_name(version)}")):
        fs.delete(_hp(jvm, tmp), False)
        raise CommitConflict(
            f"version {version} committed concurrently at {path}; re-run "
            "the delete against the new head (the carry-over base is stale)"
        )
    return {
        "version": version,
        "rows_deleted": n_before - n_after,
        "files_rewritten": len(candidates),
        "files_kept": len(kept),
    }


# ------------------------------------------------------ write-audit-publish

def snapshot_write_staged(
    spark: SparkSession,
    path: str,
    df: DataFrame,
    *,
    mode: str = "append",
    clock=time.time,
) -> str:
    """Stage a commit WITHOUT publishing it (the write half of
    write-audit-publish): data files land normally, but the manifest
    is written as ``_log/_staged-<id>.json`` — underscore-prefixed, so
    version listing and every reader ignore it. Readers keep seeing
    the current table while audits run against the staged snapshot.
    Returns the stage id."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    fs, jvm = _fs(spark, path)
    log_dir = f"{path}/{_LOG_DIR}"
    fs.mkdirs(_hp(jvm, log_dir))

    write_id = uuid.uuid4().hex[:12]
    data_dir = f"{path}/{_DATA_DIR}/w-{write_id}"
    df.write.mode("error").parquet(data_dir)
    root_prefix = _hp(jvm, path).toUri().getPath().rstrip("/") + "/"
    added = [
        p[len(root_prefix):] if p.startswith(root_prefix) else p
        for p in _data_files(fs, jvm, data_dir)
    ]
    staged = {
        "operation": mode,
        "staged_at": float(clock()),
        "schema": df.schema.json(),
        "added": added,
    }
    _write_text(fs, jvm, f"{log_dir}/_staged-{write_id}.json", json.dumps(staged))
    return write_id


def staged_snapshot_read(spark: SparkSession, path: str, stage_id: str) -> DataFrame:
    """The table AS IT WOULD LOOK if the staged commit published —
    the audit target. For mode='append' that is current ∪ staged
    files; for 'overwrite', the staged files alone."""
    fs, jvm = _fs(spark, path)
    log_dir = f"{path}/{_LOG_DIR}"
    staged = json.loads(_read_text(fs, jvm, f"{log_dir}/_staged-{stage_id}.json"))
    schema = StructType.fromJson(json.loads(staged["schema"]))
    files = [f"{path}/{rel}" for rel in staged["added"]]
    if staged["operation"] == "append":
        versions = _list_versions(fs, jvm, log_dir)
        if versions:
            base = _load_manifest(fs, jvm, log_dir, versions[-1])["files"]
            files = [f"{path}/{rel}" for rel in base] + files
    if not files:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(*files)


def publish_snapshot(
    spark: SparkSession,
    path: str,
    stage_id: str,
    *,
    audit=None,
    clock=time.time,
    max_retries: int = 3,
) -> int:
    """Audit-then-publish: run ``audit`` (a callable receiving the
    would-be table DataFrame, returning True to allow) against the
    staged snapshot, then promote the staged manifest to the next
    version with the usual rename-if-absent commit. A failing audit
    leaves the table untouched and the stage in place for triage
    (``abandon_staged`` discards it). This is the Iceberg WAP pattern:
    bad data is caught while INVISIBLE, never rolled back after
    readers saw it."""
    fs, jvm = _fs(spark, path)
    log_dir = f"{path}/{_LOG_DIR}"
    spath = f"{log_dir}/_staged-{stage_id}.json"
    staged = json.loads(_read_text(fs, jvm, spath))

    if audit is not None and not audit(staged_snapshot_read(spark, path, stage_id)):
        raise ValueError(
            f"audit rejected staged commit {stage_id} at {path}; table "
            "unchanged — fix or abandon_staged"
        )

    for _attempt in range(max_retries):
        versions = _list_versions(fs, jvm, log_dir)
        prev = versions[-1] if versions else None
        base = (
            _load_manifest(fs, jvm, log_dir, prev)["files"]
            if staged["operation"] == "append" and prev is not None
            else []
        )
        version = (prev or 0) + 1
        manifest = {
            "version": version,
            "parent": prev,
            "operation": staged["operation"],
            "committed_at": float(clock()),
            "schema": staged["schema"],
            "added": staged["added"],
            "files": base + staged["added"],
        }
        tmp = f"{log_dir}/_tmp-{uuid.uuid4().hex}.json"
        _write_text(fs, jvm, tmp, json.dumps(manifest))
        if fs.rename(_hp(jvm, tmp), _hp(jvm, f"{log_dir}/{_manifest_name(version)}")):
            fs.delete(_hp(jvm, spath), False)
            return version
        fs.delete(_hp(jvm, tmp), False)
    raise CommitConflict(
        f"lost the publish race {max_retries} times for stage {stage_id} at {path}"
    )


def abandon_staged(spark: SparkSession, path: str, stage_id: str) -> None:
    """Discard a staged commit: drop its manifest and data files.
    (Unpublished stages are also swept as orphans by
    ``expire_snapshots`` if never explicitly abandoned.)"""
    fs, jvm = _fs(spark, path)
    spath = f"{path}/{_LOG_DIR}/_staged-{stage_id}.json"
    staged = json.loads(_read_text(fs, jvm, spath))
    for rel in staged["added"]:
        fs.delete(_hp(jvm, f"{path}/{rel}"), False)
    fs.delete(_hp(jvm, f"{path}/{_DATA_DIR}/w-{stage_id}"), True)
    fs.delete(_hp(jvm, spath), False)


# ------------------------------------------------------------- bloom filters

def _bloom_params(n: int, fpp: float) -> tuple[int, int]:
    """(bits m, hash count k) for n distinct values at the target
    false-positive rate; standard sizing m = -n·ln(p)/ln²2."""
    import math

    n = max(1, n)
    m = max(8, int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2))))
    k = max(1, round(m / n * math.log(2)))
    return m, k


def _bloom_hashes(value: str) -> tuple[int, int]:
    """Two independent 64-bit hashes from one md5 (Kirsch-Mitzenmacher
    double hashing derives all k probes as h1 + i·h2)."""
    import hashlib

    d = hashlib.md5(value.encode("utf-8")).digest()
    return int.from_bytes(d[:8], "big"), int.from_bytes(d[8:], "big")


def _bloom_build(values, fpp: float) -> dict:
    vals = {str(v) for v in values if v is not None}
    m, k = _bloom_params(len(vals), fpp)
    bits = bytearray((m + 7) // 8)
    for v in vals:
        h1, h2 = _bloom_hashes(v)
        for i in range(k):
            idx = (h1 + i * h2) % m
            bits[idx >> 3] |= 1 << (idx & 7)
    import base64

    return {"m": m, "k": k, "bits": base64.b64encode(bytes(bits)).decode("ascii")}


def _bloom_maybe_contains(bloom: dict, value) -> bool:
    import base64

    bits = base64.b64decode(bloom["bits"])
    m, k = bloom["m"], bloom["k"]
    h1, h2 = _bloom_hashes(str(value))
    for i in range(k):
        idx = (h1 + i * h2) % m
        if not bits[idx >> 3] & (1 << (idx & 7)):
            return False
    return True


def snapshot_write_with_blooms(
    spark: SparkSession,
    path: str,
    df: DataFrame,
    *,
    bloom_cols: list[str],
    fpp: float = 0.01,
    mode: str = "append",
    stat_cols: list[str] | None = None,
    clock=time.time,
    max_retries: int = 3,
) -> int:
    """``snapshot_write_with_stats`` + a per-file Bloom filter for each
    ``bloom_cols`` column, recorded in the manifest.

    Min/max stats prune RANGE predicates but are useless for point
    lookups on high-cardinality scattered keys (a UUID or user-id
    column spans nearly the full domain in every file, so no file is
    ever excluded). The Bloom filter answers "could this file contain
    key X?" with a bounded false-positive rate — a needle-in-haystack
    lookup on a 100 TB table touches the handful of files whose
    filters fire instead of every file. ~1.2 KB per file per column at
    1% fpp for 1k distinct values; the manifest stays tiny.

    Filters are built from the committed files' own column pages
    (pyarrow, column-projected read — no Spark job). Values hash by
    their canonical string form, so lookups must pass the same type
    they wrote (int 5 and "5" collide by design: str(5)).
    """
    version = snapshot_write_with_stats(
        spark, path, df, mode=mode, stat_cols=stat_cols, clock=clock,
        max_retries=max_retries,
    )
    import pyarrow.parquet as pq

    fs, jvm = _fs(spark, path)
    log_dir = f"{path}/{_LOG_DIR}"
    manifest = _load_manifest(fs, jvm, log_dir, version)
    blooms: dict[str, dict] = {}
    for rel in manifest["added"]:
        tbl = pq.read_table(f"{path}/{rel}", columns=[c for c in bloom_cols])
        per_col = {}
        for c in bloom_cols:
            if c in tbl.column_names:
                per_col[c] = _bloom_build(tbl.column(c).to_pylist(), fpp)
        blooms[rel] = per_col
    manifest["blooms"] = blooms
    _write_text(fs, jvm, f"{log_dir}/{_manifest_name(version)}", json.dumps(manifest))
    return version


def snapshot_read_point(
    spark: SparkSession,
    path: str,
    *,
    col: str,
    value,
    version: int | None = None,
) -> DataFrame:
    """Point lookup ``col = value`` reading only the files whose Bloom
    filter (and min/max range, when recorded) could contain the key.
    Files without a filter are conservatively kept; the equality
    predicate is always applied, so a false positive costs one extra
    file scan, never a wrong row."""
    from pyspark.sql import functions as F

    fs, jvm = _fs(spark, path)
    log_dir = f"{path}/{_LOG_DIR}"
    v = _resolve_version(fs, jvm, log_dir, version, None)
    blooms: dict[str, dict] = {}
    stats: dict[str, dict] = {}
    for ver in _list_versions(fs, jvm, log_dir):
        if ver <= v:
            m = _load_manifest(fs, jvm, log_dir, ver)
            blooms.update(m.get("blooms", {}))
            stats.update(m.get("stats", {}))
    manifest = _load_manifest(fs, jvm, log_dir, v)
    schema = StructType.fromJson(json.loads(manifest["schema"]))

    def keep(rel: str) -> bool:
        rng = stats.get(rel, {}).get(col)
        if rng is not None:
            mn, mx = rng
            try:
                if value < mn or value > mx:
                    return False
            except TypeError:
                pass  # stat type incomparable with the probe: keep
        bl = blooms.get(rel, {}).get(col)
        if bl is not None and not _bloom_maybe_contains(bl, value):
            return False
        return True

    files = [f"{path}/{rel}" for rel in manifest["files"] if keep(rel)]
    if not files:
        return spark.createDataFrame([], schema)
    return (
        spark.read.schema(schema)
        .parquet(*files)
        .filter(F.col(col) == F.lit(value))
    )


def snapshot_foreach_batch(path: str, app_id: str, *, mode: str = "append"):
    """Exactly-once ``foreachBatch`` sink into a snapshot table:

        q = (stream.writeStream
             .foreachBatch(snapshot_foreach_batch(table, "my_app"))
             .option("checkpointLocation", ckpt).start())

    Structured Streaming guarantees ``batch_id`` is stable across
    retries and restarts of the same epoch; ``snapshot_write`` with
    ``txn=(app_id, batch_id)`` turns that into an exactly-once lake
    sink — a replayed micro-batch (failure after commit but before
    the checkpoint advanced) is recognized by its batch id and
    skipped, so the reference's at-least-once capture upload
    (same-filename replace, pipelines/utils/tasks.py:273-276) becomes
    a real transactional guarantee."""

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        snapshot_write(
            batch_df.sparkSession, path, batch_df,
            mode=mode, txn=(app_id, int(batch_id)),
        )

    return _write


def compact_small_files(
    spark: SparkSession,
    path: str,
    *,
    small_file_mb: float = 32,
    target_files: int = 4,
    min_files_to_compact: int = 2,
    stat_cols: list[str] | None = None,
    clock=time.time,
) -> dict:
    """PARTIAL compaction: rewrite only the files below
    ``small_file_mb`` into ~``target_files`` larger ones; every file
    already at a healthy size carries over into the new version
    unread and unmoved (its manifest stats and Bloom filters stay
    valid — they key on the file path, which doesn't change).

    This is the 100 TB-shape maintenance operation: a minutely
    capture stream deposits a trickle of tiny files on top of a huge
    compacted base, and ``compact_snapshot`` (full rewrite) would
    re-copy the entire table to fix a few hundred KB. Here the
    rewrite I/O is proportional to the SMALL-file volume only —
    run it on every maintenance tick.

    Commit semantics match ``snapshot_delete_where``: the commit must
    land directly on the version that was read (its file set is the
    carry-over base); a concurrent commit raises ``CommitConflict`` —
    re-run against the new head. The commit records
    operation='compact', so change feeds, the stream source, and
    incremental rollups skip it (no replay duplication). New files
    get fresh manifest min/max stats (``stat_cols`` default: every
    orderable primitive).

    Returns {"version", "files_rewritten", "files_kept"};
    version is the pre-existing head when nothing qualified.
    """
    fs, jvm = _fs(spark, path)
    log_dir = f"{path}/{_LOG_DIR}"
    head = _resolve_version(fs, jvm, log_dir, None, None)
    manifest = _load_manifest(fs, jvm, log_dir, head)
    schema = StructType.fromJson(json.loads(manifest["schema"]))

    limit = int(small_file_mb * (1 << 20))
    candidates = [
        rel
        for rel in manifest["files"]
        if fs.getFileStatus(_hp(jvm, f"{path}/{rel}")).getLen() < limit
    ]
    kept = [rel for rel in manifest["files"] if rel not in set(candidates)]
    if len(candidates) < min_files_to_compact:
        return {"version": head, "files_rewritten": 0, "files_kept": len(manifest["files"])}

    small_df = spark.read.schema(schema).parquet(
        *[f"{path}/{rel}" for rel in candidates]
    ).coalesce(target_files)

    write_id = uuid.uuid4().hex[:12]
    data_dir = f"{path}/{_DATA_DIR}/w-{write_id}"
    small_df.write.mode("error").parquet(data_dir)
    root_prefix = _hp(jvm, path).toUri().getPath().rstrip("/") + "/"
    added = [
        p[len(root_prefix):] if p.startswith(root_prefix) else p
        for p in _data_files(fs, jvm, data_dir)
    ]

    if stat_cols is None:
        stat_cols = [
            f.name
            for f in schema.fields
            if f.dataType.simpleString().split("(")[0] in _STAT_TYPES
        ]
    file_stats = _collect_file_stats([f"{path}/{rel}" for rel in added], stat_cols)
    new_stats = {rel: file_stats.get(f"{path}/{rel}", {}) for rel in added}

    version = head + 1
    new_manifest = {
        "version": version,
        "parent": head,
        "operation": "compact",
        "committed_at": float(clock()),
        "schema": manifest["schema"],
        "added": added,
        "files": kept + added,
        "stats": new_stats,
    }
    tmp = f"{log_dir}/_tmp-{uuid.uuid4().hex}.json"
    _write_text(fs, jvm, tmp, json.dumps(new_manifest))
    if not fs.rename(_hp(jvm, tmp), _hp(jvm, f"{log_dir}/{_manifest_name(version)}")):
        fs.delete(_hp(jvm, tmp), False)
        raise CommitConflict(
            f"version {version} committed concurrently at {path}; re-run "
            "the compaction against the new head (the carry-over base is stale)"
        )
    return {
        "version": version,
        "files_rewritten": len(candidates),
        "files_kept": len(kept),
    }
