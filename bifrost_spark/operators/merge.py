"""TargetTable — MERGE INTO semantics on plain parquet, Iceberg-shaped.

No lake-format jars ship in this sandbox, so the Iceberg sink from
SURVEY.md §7 step 2 is implemented behind this interface: a
bucket-partitioned, snapshot-versioned, copy-on-write table whose commit
protocol gives the same guarantees a MERGE INTO an Iceberg table would:

- **Bucket partitioning** ``bucket = pmod(xxhash64(repo, path), n_buckets)``
  (Iceberg's ``bucket(N, ...)`` transform).  A merge rewrites ONLY the
  buckets its batch touches — at 100 TB with n_buckets=16384 a typical
  micro-batch touches a bounded subset and the rewrite cost is proportional
  to touched data, not table size.
- **Snapshot versioning**: each commit writes new parquet under
  ``data/<snapshot>/bucket=NN/`` then atomically swings ``_state/CURRENT``
  (os.replace) to a JSON manifest mapping every bucket to the snapshot that
  last rewrote it.  Readers see the old state until the pointer moves;
  a crash mid-commit leaves only orphan files (GC-able), never a torn table.
- **Idempotent commit manifests** (exactly-once, SURVEY.md §4 custom-work 2):
  the manifest records applied batches two ways — a bounded tail of recent
  entries (observability) and ``applied_ranges``, a MERGED interval set of
  committed event_id ranges.  The replay check is range containment, so the
  state JSON stays **O(1)** over a 10^6-batch stream (ordered delivery makes
  the ranges contiguous → they collapse to one interval), instead of growing
  O(batches) and being rewritten every commit.  Per-bucket lineage metrics go
  to an append-only ``_state/lineage.jsonl`` sidecar for the same reason.
  ``merge()`` first checks the applied set and no-ops on replay — the Spark
  rebuild of the reference's LastSuccessBinlog-only-on-commit discipline
  (/root/reference/server/to_server_consume.go:133-160,
  /root/reference/server/storage.go:52-128), strengthened from
  at-least-once+idempotent-sink to exactly-once.
- **MERGE guard + tombstones**: a source op only lands if ``src.event_id >
  tgt.last_event_id`` (safe under overlapping replays, SURVEY.md §7), and
  deletes are kept as TOMBSTONE rows (``is_deleted=true`` with the delete's
  event_id) rather than physically removed.  Together these make ``merge``
  COMMUTATIVE across disjoint batches: applying batch ranges in any order
  yields the same final state — required because a streaming file source
  does not guarantee chunk order, and it is what allows concurrent
  per-bucket appliers on a real cluster.  Without tombstones, a late
  lower-event_id upsert would resurrect a key whose higher-event_id delete
  had already been applied and physically dropped.  Tombstones are GC-able
  at compaction time once the source low-water mark passes their event_id
  (same discipline as Iceberg positional-delete compaction).
- **Schema evolution is metadata-only**: the registry rides in the manifest;
  old files are never rewritten on ADD/MODIFY/DROP COLUMN — reads align
  (null-pad / cast / prune) to the current version, like Iceberg schema ids.

Reference semantics being reproduced: MySQL-sink REPLACE/ON-DUP-KEY/DELETE
batch apply (/root/reference/plugin/mysql/src/mysql_normal_sync.go:16-146)
and ClickHouse delete+insert apply
(/root/reference/plugin/clickhouse/src/normal_sync.go:18-203), with batch
commit alignment (/root/reference/plugin/mysql/src/mysql.go:482-668).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bifrost_spark.metafs import metafs_for
from bifrost_spark.registry import SchemaRegistry
from bifrost_spark.schemas import LOGICAL_TYPES, PK_COLUMNS, TARGET_BASE_FIELDS

BASE_COLS = [f.name for f in TARGET_BASE_FIELDS]  # repo path commit lang content last_event_id



def _write_width(n_buckets: int) -> int:
    """Post-shuffle width for bucket-partitioned writes.  Default 2×buckets:
    hashing twice as many partitions as buckets thins collision hot spots
    (two buckets landing on one reducer) at the cost of ~2 files/bucket;
    A/B'd on the bench batch shape (BIFROST_WRITE_WIDTH_MULT to retune on
    other cluster/bucket geometries).  A malformed env value falls back to
    the default rather than crashing every write path far from the knob."""
    try:
        mult = int(os.environ.get("BIFROST_WRITE_WIDTH_MULT", "2"))
    except ValueError:
        mult = 2
    return max(1, mult) * n_buckets


def _write_codec() -> str:
    """Parquet codec for table data writes.  Default lz4: A/B'd on the bench
    replay shape at local[32] (4M events, 32 buckets) — lz4 16.1 s vs snappy
    17.3 s vs zstd slowest, at equal file size to snappy — and lz4 keeps the
    fastest decompression for the read-heavy side at scale.  zstd remains
    the right pick when storage cost dominates compute (cold archives):
    BIFROST_WRITE_CODEC=zstd."""
    return os.environ.get("BIFROST_WRITE_CODEC", "lz4")

def bucket_expr(n_buckets: int):
    return F.pmod(F.xxhash64(*[F.col(c) for c in PK_COLUMNS]), F.lit(n_buckets)).cast("int")


# Ordered replay commits contiguous event_id ranges, so the merged set
# collapses toward ~1 interval and the manifest stays O(1), not O(batches).
# Shared with the GTID sets (same algebra): bifrost_spark/intervals.py.
from bifrost_spark.intervals import merge_intervals as _merge_ranges  # noqa: E402


class TargetTable:
    """A single-writer, multi-reader upsert table (see module docstring)."""

    def __init__(self, spark: SparkSession, path: str, at_snapshot: str | None = None):
        """Open the table at CURRENT, or — time travel — at any retained
        snapshot (``at_snapshot="v00000007"``): every commit leaves its full
        manifest under ``_state/<snap>.json`` and its data under
        ``data/<snap>/``, so an old state is just a different manifest to
        read through (the Iceberg snapshot-read model; ``vacuum()`` is what
        eventually retires old snapshots' data files).  A time-traveled
        handle is strictly READ-ONLY — any commit attempt raises rather
        than forking history."""
        self.spark = spark
        self.path = path
        # metadata I/O goes through a scheme-selected FS (metafs.py): POSIX
        # for plain paths, the Hadoop FileSystem API for hdfs://, s3a://,
        # file://, ... — the ADVICE round-1 object-store follow-up
        self._fs = metafs_for(spark, path)
        self._at_snapshot = at_snapshot
        if at_snapshot is not None:
            def _read_only(*_a, **_kw):
                raise RuntimeError(
                    f"table opened read-only via time travel (at_snapshot={at_snapshot!r}); "
                    "open without at_snapshot to write"
                )
            # shadows the commit point for this instance only — every
            # mutation funnels through _write_snapshot, so one guard covers
            # apply/merge/quarantine/repair/compact/vacuum alike
            self._write_snapshot = _read_only
        self._load_state()

    def _assert_writable(self, op: str) -> None:
        """Fail mutating entry points up front on a time-traveled handle.
        The _write_snapshot shadow still backstops the final commit, but
        raising at entry avoids running a whole merge job and littering
        orphan data/<snap> dirs that only a later vacuum would reclaim."""
        if self._at_snapshot is not None:
            raise RuntimeError(
                f"{op}: table opened read-only via time travel "
                f"(at_snapshot={self._at_snapshot!r}); open without "
                "at_snapshot to write"
            )

    def snapshots(self) -> list[dict]:
        """Commit history: one entry per retained snapshot manifest, oldest
        first — (snapshot, last_event_id, n_commits, data_present).  Data
        presence goes false once ``vacuum()`` retires a snapshot's files;
        such snapshots are still listed (the manifest documents history)
        but no longer time-travel-readable."""
        state_dir = os.path.join(self.path, "_state")
        out = []
        for name in sorted(self._fs.listdir(state_dir)):
            if not (name.startswith("v") and name.endswith(".json")):
                continue
            snap = name[:-5]
            st = json.loads(self._fs.read_text(os.path.join(state_dir, name)))
            data_dirs = {s for s in st.get("buckets", {}).values()}
            present = all(
                self._fs.exists(os.path.join(self.path, "data", s)) for s in data_dirs
            )
            out.append({"snapshot": snap, "last_event_id": st.get("last_event_id"),
                        "n_commits": st.get("n_commits", 0), "data_present": present})
        return out

    # ------------------------------------------------------------------ state
    @classmethod
    def create(cls, spark: SparkSession, path: str, n_buckets: int = 32,
               registry: SchemaRegistry | None = None) -> "TargetTable":
        fs = metafs_for(spark, path)
        fs.makedirs(os.path.join(path, "_state"))
        fs.makedirs(os.path.join(path, "data"))
        state = {
            "snapshot": "v00000000",
            "n_buckets": n_buckets,
            "registry": (registry or SchemaRegistry()).to_dict(),
            "schema_version": (registry or SchemaRegistry()).current_version,
            "buckets": {},
            "applied": [],          # bounded tail of recent commit entries
            "applied_ranges": [],   # merged [lo, hi] event_id intervals (O(1) steady-state)
            "n_commits": 0,
            "last_event_id": -1,
        }
        cls._write_snapshot(fs, path, state)
        return cls(spark, path)

    @staticmethod
    def _write_snapshot(fs, path: str, state: dict) -> None:
        snap = state["snapshot"]
        fs.write_text_atomic(os.path.join(path, "_state", f"{snap}.json"), json.dumps(state))
        # the atomic CURRENT swing is the one-and-only commit point
        fs.write_text_atomic(os.path.join(path, "_state", "CURRENT"), snap)

    def _load_state(self) -> None:
        if getattr(self, "_at_snapshot", None) is not None:
            snap = self._at_snapshot
            if not self._fs.exists(os.path.join(self.path, "_state", f"{snap}.json")):
                have = [e["snapshot"] for e in self.snapshots()]
                raise FileNotFoundError(
                    f"no snapshot manifest {snap!r} under {self.path}; retained: {have}")
        else:
            snap = self._fs.read_text(os.path.join(self.path, "_state", "CURRENT")).strip()
        self.state = json.loads(self._fs.read_text(os.path.join(self.path, "_state", f"{snap}.json")))
        # migrate pre-interval-manifest state (round-1 tables)
        if "applied_ranges" not in self.state:
            self.state["applied_ranges"] = _merge_ranges(
                [a["min_event_id"], a["max_event_id"]]
                for a in self.state["applied"]
                if a.get("min_event_id") is not None
            )
            self.state["n_commits"] = len(self.state["applied"])
        self.registry = SchemaRegistry.from_dict(self.state["registry"])

    @property
    def n_buckets(self) -> int:
        return self.state["n_buckets"]

    @property
    def applied_batch_ids(self) -> set[str]:
        """Batch ids in the bounded recent tail (observability/back-compat;
        the durable replay check is ``is_applied`` range containment)."""
        return {a["batch_id"] for a in self.state["applied"]}

    def is_applied(self, batch_id: str, batch_range: tuple[int, int] | None = None,
                   range_exclusive: bool = False) -> bool:
        """Exactly-once replay check, O(log intervals): a batch is applied
        if its id is in the recent tail OR (``range_exclusive`` only) its
        event_id range is fully covered by the committed interval set.

        Range containment is the durable signal — the tail is bounded, so
        over a 10^6-batch stream old batch ids age out of it while their
        ranges stay merged forever — but it is only VALID when the caller
        delivers range-exclusive batches: every event_id inside a batch's
        [min, max] belongs to that batch (binlog position ranges, ordered
        chunk replay).  A streaming file source interleaves ids across
        files, so one file's [min, max] spans ids other files deliver —
        there the check falls back to the id tail, and redelivery beyond
        the tail is still safe (not skipped, but a no-op) via the
        commutative guard+tombstone merge."""
        if batch_id in self.applied_batch_ids:
            return True
        if not range_exclusive or batch_range is None or batch_range[0] is None:
            return False
        lo, hi = batch_range
        import bisect
        ranges = self.state["applied_ranges"]
        i = bisect.bisect_right([r[0] for r in ranges], lo) - 1
        return i >= 0 and ranges[i][1] >= hi

    def _record_applied(self, st: dict, entry: dict) -> None:
        """Append a commit entry: bounded tail + merged interval set."""
        tail_cap = int(os.environ.get("BIFROST_APPLIED_TAIL", "256"))
        st["applied"] = (st["applied"] + [entry])[-tail_cap:]
        st["n_commits"] = st.get("n_commits", 0) + 1
        if entry.get("min_event_id") is not None and entry.get("max_event_id") is not None:
            st["applied_ranges"] = _merge_ranges(
                st.get("applied_ranges", []) + [[entry["min_event_id"], entry["max_event_id"]]],
                max_intervals=int(os.environ.get("BIFROST_APPLIED_INTERVALS", "64")),
            )

    @property
    def last_event_id(self) -> int:
        return self.state["last_event_id"]

    @property
    def gtid_executed(self) -> str:
        """MySQL-interop view of the applied set (``gtid.GtidSet`` string);
        the event_id interval manifest stays the exactly-once authority."""
        return self.state.get("gtid_executed", "")

    @staticmethod
    def _union_gtid(st: dict, gtid_set: str | None) -> None:
        if gtid_set:
            from bifrost_spark.gtid import GtidSet

            st["gtid_executed"] = str(
                GtidSet.parse(st.get("gtid_executed")).union(gtid_set).compact()
            )

    def _next_snapshot(self) -> str:
        return f"v{int(self.state['snapshot'][1:]) + 1:08d}"

    # ------------------------------------------------------------------ read
    def _schema(self) -> T.StructType:
        fields = list(TARGET_BASE_FIELDS)
        for name, ltype in self.registry.extra_columns(self.state["schema_version"]):
            fields.append(T.StructField(name, LOGICAL_TYPES.get(ltype, T.StringType())))
        return T.StructType(fields)

    def _empty(self) -> DataFrame:
        s = self._schema().add("is_deleted", T.BooleanType()).add("bucket", T.IntegerType())
        return self.spark.createDataFrame([], s)

    def read(self, buckets: list[int] | None = None, include_deleted: bool = False) -> DataFrame:
        """Current table state (optionally pruned to a bucket subset).

        Buckets written under different snapshots/schema versions are read
        per snapshot dir and unioned with null padding, then aligned (cast /
        prune) to the current schema version.  The ``bucket=NN`` directory
        layout makes the bucket filter a partition prune, not a data scan.
        """
        bmap: dict[str, str] = self.state["buckets"]
        want = {str(b) for b in buckets} if buckets is not None else set(bmap)
        by_snap: dict[str, list[str]] = {}
        for b, snap in bmap.items():
            if b in want:
                by_snap.setdefault(snap, []).append(b)
        if not by_snap:
            out = self._empty()
        else:
            parts: list[DataFrame] = []
            schemas: dict[str, dict] = self.state.get("schemas", {})
            for snap, bs in sorted(by_snap.items()):
                reader = self.spark.read
                if snap in schemas:
                    # the manifest records each snapshot's written schema —
                    # an explicit .schema() skips the parquet footer
                    # inference job (one driver job per snapshot per read).
                    reader = reader.schema(T.StructType.fromJson(schemas[snap]))
                df = reader.parquet(os.path.join(self.path, "data", snap))
                df = df.filter(F.col("bucket").isin([int(x) for x in bs]))
                parts.append(df)
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p, allowMissingColumns=True)
            if "is_deleted" not in out.columns:
                out = out.withColumn("is_deleted", F.lit(False))
        # include_deleted=True is the internal rewrite surface (merge target
        # reads, compaction): it keeps the residual ``extra`` map so values
        # whose DDL has not been applied yet survive the copy-on-write.  The
        # public read materializes extras (coalesced from the map) and drops
        # the map column.
        aligned = self.registry.align(
            out, self.state["schema_version"], base_cols=[*BASE_COLS, "is_deleted", "bucket"],
            keep_extra_map=include_deleted,
        )
        if not include_deleted:
            aligned = aligned.filter(~F.col("is_deleted")).drop("is_deleted")
        return aligned

    def to_pandas_sorted(self):
        import pandas as pd  # noqa: F401
        return (
            self.read()
            .drop("bucket")
            .orderBy(*PK_COLUMNS)
            .toPandas()
        )

    # ------------------------------------------------------------------ write
    def bootstrap(self, snapshot_df: DataFrame, batch_id: str = "bootstrap") -> dict:
        """Initial full-sync load (reference "history", SURVEY.md §3.2):
        INSERT OVERWRITE of every bucket, event_id=0 rows."""
        # batch-id equality ONLY: range containment of (0,0) would also
        # match any later commit touching event 0, silently skipping an
        # intentional re-bootstrap under a fresh batch_id.  Ids live in a
        # dedicated durable list (bootstraps are rare) so idempotence
        # survives the bounded applied tail — a re-run would INSERT
        # OVERWRITE replayed state.
        if batch_id in self.state.get("bootstraps", []) or batch_id in self.applied_batch_ids:
            return {"skipped": True, "batch_id": batch_id}
        snap = self._next_snapshot()
        out_dir = os.path.join(self.path, "data", snap)
        df = snapshot_df.withColumn("bucket", bucket_expr(self.n_buckets)).withColumn("is_deleted", F.lit(False))
        df = self.registry.align(df, self.state["schema_version"], base_cols=[*BASE_COLS, "is_deleted", "bucket"],
                                 keep_extra_map=True)
        df.repartition(_write_width(self.n_buckets), "bucket").write.partitionBy("bucket").option("compression", _write_codec()).mode("overwrite").parquet(out_dir)
        written = self._buckets_in(out_dir)
        st = dict(self.state)
        st["snapshot"] = snap
        st["schemas"] = {**st.get("schemas", {}), snap: df.schema.jsonValue()}
        st["buckets"] = {str(b): snap for b in written}
        self._record_applied(st, {"batch_id": batch_id, "min_event_id": 0, "max_event_id": 0,
                                  "n_ops": None, "kind": "bootstrap", "committed_at": time.time()})
        st["bootstraps"] = st.get("bootstraps", []) + [batch_id]
        self._write_snapshot(self._fs, self.path, st)
        self._load_state()
        return {"skipped": False, "batch_id": batch_id, "buckets": len(written)}

    def _append_lineage(self, entry: dict) -> None:
        self._fs.append_line(os.path.join(self.path, "_state", "lineage.jsonl"), json.dumps(entry))

    def lineage(self) -> dict[str, dict]:
        """Per-bucket lineage metrics by batch_id (advisory sidecar;
        last line wins for a batch_id re-appended during crash replay)."""
        out: dict[str, dict] = {}
        for line in self._fs.read_lines(os.path.join(self.path, "_state", "lineage.jsonl")):
            if line.strip():
                e = json.loads(line)
                out[e["batch_id"]] = e
        return out

    def _buckets_in(self, out_dir: str) -> list[int]:
        return sorted(
            int(d.split("=", 1)[1]) for d in self._fs.listdir(out_dir) if d.startswith("bucket=")
        )

    def _bucket_bytes(self, buckets: list[int]) -> int:
        """On-disk bytes of the given buckets' current data files — driver-side
        metadata only (the bucket→snapshot map names each directory)."""
        bmap: dict[str, str] = self.state["buckets"]
        total = 0
        for b in buckets:
            snap = bmap.get(str(b))
            if snap is None:
                continue
            total += self._fs.dir_size(os.path.join(self.path, "data", snap, f"bucket={b}"))
        return total

    def _materialize_extras(self, src: DataFrame, sv: int) -> DataFrame:
        """Split an op batch's raw ``extra`` map into typed columns for every
        extra KNOWN at schema version ``sv`` plus a residual map of the rest.
        The residual is what makes DDL order-independent: an unordered stream
        can deliver post-DDL events before the DDL barrier itself, and their
        values ride the residual map until the column exists (reads coalesce
        typed-then-map, see ``SchemaRegistry.align``)."""
        names = [n for n, _t in self.registry.extra_columns(sv)]
        if "extra" in src.columns:
            for name, ltype in self.registry.extra_columns(sv):
                src = src.withColumn(name, F.col("extra")[name].cast(LOGICAL_TYPES.get(ltype, T.StringType())))
            if names:
                src = src.withColumn("extra", F.map_filter(F.col("extra"), lambda k, _v: ~k.isin(*names)))
        else:
            src = src.withColumn("extra", F.lit(None).cast(T.MapType(T.StringType(), T.StringType())))
        return src

    def merge(self, resolved: DataFrame, batch_id: str, batch_range: tuple[int, int],
              schema_version: int | None = None, range_exclusive: bool = False,
              gtid_set: str | None = None) -> dict:
        """MERGE the LWW-resolved ops (one terminal op per PK) into the table.

        Equivalent SQL (SURVEY.md §2.3 M1):
          MERGE INTO target t USING resolved s ON t.repo=s.repo AND t.path=s.path
          WHEN MATCHED AND s.op='delete' AND s.event_id > t.last_event_id THEN DELETE
          WHEN MATCHED AND s.event_id > t.last_event_id THEN UPDATE SET *
          WHEN NOT MATCHED AND s.op!='delete' THEN INSERT *
        """
        if self.is_applied(batch_id, batch_range, range_exclusive):
            return {"skipped": True, "batch_id": batch_id}

        sv = self.state["schema_version"] if schema_version is None else schema_version
        extras = [n for n, _t in self.registry.extra_columns(sv)]

        src = resolved.withColumn("bucket", bucket_expr(self.n_buckets))
        src = self._materialize_extras(src, sv)
        src = src.select(
            *PK_COLUMNS, "op", "commit", "lang", "content",
            F.col("event_id").alias("src_event_id"), "bucket", *extras, "extra",
        ).persist()

        # per-bucket lineage metrics + affected-bucket list in ONE small job
        # over the already-deduped source (≤1 row per key).
        t_lww = time.time()
        mrows = (
            src.groupBy("bucket")
            .agg(
                F.count("*").alias("rows_in"),
                F.sum(F.when(F.col("op") == "upsert", 1).otherwise(0)).alias("upserts"),
                F.sum(F.when(F.col("op") == "delete", 1).otherwise(0)).alias("deletes"),
                F.min("src_event_id").alias("min_event_id"),
                F.max("src_event_id").alias("max_event_id"),
                # the broadcast-safety gate needs ALL payload bytes — a wide
                # batch can live in DDL-added extras / the residual map with
                # a tiny content column (to_json covers both in one expr)
                F.sum(
                    F.coalesce(F.length("content"), F.lit(0))
                    + F.coalesce(F.length(F.to_json(F.struct(*extras, "extra"))), F.lit(0))
                ).alias("content_bytes"),
            )
            .collect()
        )
        affected = sorted(r["bucket"] for r in mrows)
        t0 = time.time()
        lww_ms = (t0 - t_lww) * 1000
        if not affected:
            src.unpersist()
            return self._commit_noop(batch_id, batch_range)

        tgt = self.read(buckets=affected, include_deleted=True)

        # use_src: the source op wins iff it is strictly newer (tgt absent ⇒
        # newer).  Deletes become tombstones, never row removal — this makes
        # merge commutative across disjoint batches (see module docstring).
        use_src = F.col("s.op").isNotNull() & (
            F.col("s.src_event_id") > F.coalesce(F.col("t.last_event_id"), F.lit(-1))
        )
        src_is_del = use_src & (F.col("s.op") == "delete")

        def pick(col: str):
            return (
                F.when(src_is_del, F.lit(None))
                .when(use_src, F.col(f"s.{col}"))
                .otherwise(F.col(f"t.{col}"))
                .alias(col)
            )

        def merged_select(joined: DataFrame) -> DataFrame:
            return joined.select(
                *PK_COLUMNS,
                pick("commit"),
                pick("lang"),
                pick("content"),
                F.when(use_src, F.col("s.src_event_id")).otherwise(F.col("t.last_event_id")).alias("last_event_id"),
                F.when(use_src, F.col("s.op") == "delete")
                .otherwise(F.coalesce(F.col("t.is_deleted"), F.lit(False)))
                .alias("is_deleted"),
                *[pick(c) for c in extras],
                pick("extra"),
                F.coalesce(F.col("t.bucket"), F.col("s.bucket")).alias("bucket"),
            )

        n_ops = int(sum(r["rows_in"] for r in mrows))
        # Path choice is cost-based AND byte-based: the broadcast
        # decomposition only wins when the affected target data is much
        # larger than the batch (the steady-state shape at 100 TB, where it
        # avoids shuffling the rewritten buckets) — and it is only SAFE when
        # the broadcast relation actually fits executor memory, which is a
        # byte bound, not a row bound (300k wide rows can be GBs).  Batch
        # bytes here are MEASURED (payload lengths from the metrics agg just
        # run), not estimated per-row; affected-target bytes come free from
        # the bucket file map.
        tgt_bytes = self._bucket_bytes(affected)
        content_bytes = int(sum(r["content_bytes"] or 0 for r in mrows))
        src_bytes_est = content_bytes + n_ops * int(os.environ.get("BIFROST_OP_OVERHEAD_BYTES", "128"))
        bcast_max_bytes = int(os.environ.get("BIFROST_BROADCAST_MAX_BYTES", str(128 * 1024 * 1024)))
        bcast_ratio = float(os.environ.get("BIFROST_BCAST_TGT_RATIO", "4"))
        snap = self._next_snapshot()
        out_dir = os.path.join(self.path, "data", snap)

        merge_path = "broadcast" if (
            src_bytes_est <= bcast_max_bytes and tgt_bytes > bcast_ratio * src_bytes_est
        ) else "shuffle"
        if merge_path == "broadcast":
            # Broadcast-decomposed MERGE (batch ≪ table, the steady-state
            # shape at 100 TB): full outer join cannot broadcast, so split it
            #   1. tgt LEFT OUTER broadcast(src): updates/deletes/keeps —
            #      the target STREAMS through, zero shuffle, and each task
            #      keeps its on-disk bucket alignment so the partitioned
            #      write needs no repartition (≤1 file per input split).
            #   2. inserts = src ANTI (matched keys), where matched keys come
            #      from a column-pruned key-only scan of tgt (reads just the
            #      PK columns from parquet) semi-joined against broadcast
            #      src keys — again no shuffle.
            joined = tgt.alias("t").join(F.broadcast(src).alias("s"), on=PK_COLUMNS, how="left_outer")
            out_upd = merged_select(joined)
            src_keys = src.select(*PK_COLUMNS)
            matched = tgt.select(*PK_COLUMNS).join(F.broadcast(src_keys), on=PK_COLUMNS, how="left_semi")
            inserts = src.join(F.broadcast(matched), on=PK_COLUMNS, how="left_anti")
            out_ins = inserts.select(
                *PK_COLUMNS,
                *[F.when(F.col("op") == "delete", F.lit(None)).otherwise(F.col(c)).alias(c)
                  for c in ("commit", "lang", "content")],
                F.col("src_event_id").alias("last_event_id"),
                (F.col("op") == "delete").alias("is_deleted"),
                *[F.when(F.col("op") == "delete", F.lit(None)).otherwise(F.col(c)).alias(c) for c in extras],
                F.when(F.col("op") == "delete", F.lit(None)).otherwise(F.col("extra")).alias("extra"),
                F.col("bucket"),
            )
            out = out_upd.unionByName(out_ins)
            out.write.partitionBy("bucket").option("compression", _write_codec()).mode("overwrite").parquet(out_dir)
        else:
            # Comparable-size (or very large batch) merge: shuffle-based full
            # outer join — both sides exchange once on the PK, AQE handles
            # skew — then ONE output file per bucket via a bucket-hash
            # repartition, so the table's file count stays equal to its
            # bucket count instead of tasks × buckets.
            joined = tgt.alias("t").join(src.alias("s"), on=PK_COLUMNS, how="full_outer")
            out = merged_select(joined)
            (
                # hash-repartition on bucket at 2x width: every bucket VALUE
                # maps to exactly one partition (one output file per bucket),
                # the 2x width thins hash collisions (two buckets sharing a
                # write task), and unlike repartitionByRange there is no
                # sampling pass — range partitioning re-executes the whole
                # upstream merge once just to pick bounds (measured +11%).
                out.repartition(2 * max(len(affected), 1), "bucket")
                .write.partitionBy("bucket")
                .option("compression", _write_codec())
                .mode("overwrite")
                .parquet(out_dir)
            )
        src.unpersist()
        written = set(self._buckets_in(out_dir))
        wall_ms = (time.time() - t0) * 1000

        st = dict(self.state)
        st["snapshot"] = snap
        bmap = dict(st["buckets"])
        for b in affected:
            if b in written:
                bmap[str(b)] = snap
            else:
                bmap.pop(str(b), None)  # bucket emptied by deletes
        st["buckets"] = bmap
        live_snaps = set(bmap.values())
        st["schemas"] = {
            s: j
            for s, j in {**st.get("schemas", {}), snap: out.schema.jsonValue()}.items()
            if s in live_snaps
        }
        st["last_event_id"] = max(st["last_event_id"], batch_range[1])
        self._union_gtid(st, gtid_set)
        self._record_applied(st, {
            "batch_id": batch_id,
            "min_event_id": batch_range[0],
            "max_event_id": batch_range[1],
            "kind": "merge",
            "n_ops": n_ops,
            "committed_at": time.time(),
            "wall_ms": wall_ms,
        })
        self._write_snapshot(self._fs, self.path, st)
        self._load_state()
        # Per-bucket lineage goes to an append-only sidecar, NOT the state
        # JSON: the state is rewritten on every commit, so embedding
        # O(buckets) metrics per batch would make each commit O(batches ×
        # buckets) — unbounded at stream scale.  Lineage is advisory and
        # appended AFTER the atomic CURRENT swing (both merge paths do the
        # same), so a lineage entry always refers to a committed batch; the
        # crash window is committed-without-lineage, which a crash-replay
        # repairs because the manifest skip path re-appends nothing and the
        # entry is keyed by batch_id (last line wins).
        self._append_lineage(
            {
                "batch_id": batch_id,
                "wall_ms": wall_ms,
                "merge_path": merge_path,
                "metrics": [
                    {
                        "bucket": r["bucket"],
                        "rows_in": r["rows_in"],
                        "upserts": r["upserts"],
                        "deletes": r["deletes"],
                        "min_event_id": r["min_event_id"],
                        "max_event_id": r["max_event_id"],
                    }
                    for r in mrows
                ],
            }
        )
        return {
            "skipped": False,
            "batch_id": batch_id,
            "buckets_rewritten": len(affected),
            "n_ops": n_ops,
            "merge_path": merge_path,
            "src_bytes_est": src_bytes_est,
            "lww_ms": lww_ms,
            "wall_ms": wall_ms,
        }

    def apply_ops(self, ops: DataFrame, batch_id: str, batch_range: tuple[int, int],
                  schema_version: int | None = None, n_ops_hint: int | None = None,
                  n_keys_hint: int | None = None,
                  lww_strategy: str = "agg", range_exclusive: bool = False,
                  gtid_set: str | None = None) -> dict:
        """Apply RAW (un-deduped) keyed ops — cost-based physical choice:

        - batch ≪ table (the 100 TB steady state): resolve LWW first, then
          the broadcast-decomposed ``merge`` that streams only the affected
          buckets through with zero shuffle;
        - batch ~ table (bootstrap-adjacent, bench shape): the FUSED path —
          MERGE *is* LWW, so union the live table rows (as ops at
          ``seq = 2*last_event_id + 1``, tombstones as deletes) with the raw
          batch ops and take one ``max_by`` per key.  ONE payload shuffle
          total — hash-partitioned on ``bucket`` so the same exchange serves
          the LWW aggregate AND the partitionBy("bucket") write (see the
          single-exchange note in ``_merge_fused``); replaces LWW-shuffle +
          sort-merge-join + write-repartition (three shuffles) of the naive
          plan.  Tie at equal seq can only be a redelivered identical op, so
          either winner is byte-identical (guard semantics of ``merge`` are
          preserved: a src op beats a table row only when strictly newer).
        """
        self._assert_writable("apply_ops")
        if self.is_applied(batch_id, batch_range, range_exclusive):
            return {"skipped": True, "batch_id": batch_id}
        # The cost choice needs a batch size AND a distinct-key estimate.
        # Callers on the hot path (the replay engine, the streaming job)
        # pass both from the stats they already have; an external caller
        # without hints gets ONE agg job here (count + approx distinct
        # keys, same scan) rather than being silently routed to the fused
        # FULL-TABLE rewrite with the hot-key pre-LWW guard disarmed.
        if n_ops_hint is not None and n_keys_hint is None:
            # A size hint alone would silently disarm the pre-LWW hot-key
            # guard (bool(None) is False) — still estimate the key count.
            from bifrost_spark.schemas import PK_COLUMNS

            n_keys_hint = ops.agg(
                F.approx_count_distinct(
                    F.concat_ws("\x01", *[F.col(c) for c in PK_COLUMNS])
                ).alias("k")
            ).collect()[0]["k"]
        if n_ops_hint is not None:
            n_ops = n_ops_hint
        else:
            from bifrost_spark.schemas import PK_COLUMNS

            r = ops.agg(
                F.count("*").alias("n"),
                F.approx_count_distinct(
                    F.concat_ws("\x01", *[F.col(c) for c in PK_COLUMNS])
                ).alias("k"),
            ).collect()[0]
            n_ops = r["n"]
            if n_keys_hint is None:
                n_keys_hint = r["k"]
        tgt_bytes = self._bucket_bytes([int(b) for b in self.state["buckets"]])
        src_bytes_est = n_ops * int(os.environ.get("BIFROST_AVG_OP_BYTES", "512"))
        bcast_max_bytes = int(os.environ.get("BIFROST_BROADCAST_MAX_BYTES", str(128 * 1024 * 1024)))
        bcast_ratio = float(os.environ.get("BIFROST_BCAST_TGT_RATIO", "4"))
        if src_bytes_est <= bcast_max_bytes and tgt_bytes > bcast_ratio * src_bytes_est:
            from bifrost_spark.operators.lww import resolve_lww

            return self.merge(resolve_lww(ops, strategy=lww_strategy), batch_id=batch_id,
                              batch_range=batch_range, schema_version=schema_version,
                              range_exclusive=range_exclusive, gtid_set=gtid_set)
        # Fused-path hot-key decision, cost-based like everything above: when
        # the source tells us its distinct-key estimate (the chunk index
        # records approx_count_distinct per segment at write time; the
        # fallback stats scan computes it in the same agg), a batch whose
        # ops-per-key ratio exceeds BIFROST_FUSED_PRELWW_RATIO (default 8)
        # pre-resolves LWW so the duplicates collapse map-side BEFORE the
        # single bucket exchange instead of piling onto one reducer.
        # BIFROST_FUSED_PRELWW=1/0 force-overrides in either direction.
        force = os.environ.get("BIFROST_FUSED_PRELWW", "").lower()
        if force in ("1", "true", "yes"):
            pre_lww = True
        elif force in ("0", "false", "no"):
            pre_lww = False
        else:
            ratio = float(os.environ.get("BIFROST_FUSED_PRELWW_RATIO", "8"))
            pre_lww = bool(n_keys_hint) and n_ops >= ratio * n_keys_hint
        return self._merge_fused(ops, batch_id, batch_range, schema_version,
                                 gtid_set=gtid_set, pre_lww=pre_lww,
                                 lww_strategy=lww_strategy)

    def _merge_fused(self, ops: DataFrame, batch_id: str, batch_range: tuple[int, int],
                     schema_version: int | None = None, gtid_set: str | None = None,
                     pre_lww: bool = False, lww_strategy: str = "agg") -> dict:
        sv = self.state["schema_version"] if schema_version is None else schema_version
        extras = [n for n, _t in self.registry.extra_columns(sv)]
        t0 = time.time()

        if pre_lww:
            # Hot-key mitigation (chosen cost-based in apply_ops): the
            # single-exchange plan below shuffles RAW batch ops to their
            # bucket reducer, so a dup-heavy batch would pile one key's ops
            # onto one task.  Pre-resolving LWW costs one extra PK exchange
            # of the BATCH ONLY (map-side partial max_by collapses the hot
            # key to ≤1 row per map task before it moves) — the table side
            # still rides the single bucket exchange.  The caller's
            # lww_strategy is honored — salted_window exists precisely for
            # the hot-key batches that land here.
            from bifrost_spark.operators.lww import resolve_lww

            ops = resolve_lww(ops, strategy=lww_strategy)

        src = self._materialize_extras(ops, sv)
        src = src.select(
            *PK_COLUMNS, "op", "commit", "lang", "content", *extras, "extra",
            F.col("event_id"), F.col("seq").cast("long").alias("seq"),
            bucket_expr(self.n_buckets).alias("bucket"),
        )

        tgt = self.read(buckets=None, include_deleted=True)
        tgt_ops = tgt.select(
            *PK_COLUMNS,
            F.when(F.col("is_deleted"), F.lit("delete")).otherwise(F.lit("upsert")).alias("op"),
            "commit", "lang", "content", *extras, "extra",
            F.col("last_event_id").alias("event_id"),
            # a live row ranks as the upsert that produced it; a tombstone as
            # its delete — same encoding events_to_ops uses (2e / 2e+1).
            (F.col("last_event_id") * 2 + F.when(F.col("is_deleted"), F.lit(0)).otherwise(F.lit(1)))
            .cast("long").alias("seq"),
            F.col("bucket"),
        )

        # ONE payload exchange for LWW *and* the partitioned write: bucket is
        # a pure function of the PK, so hash-partitioning on bucket alone
        # already co-locates every row of a PK — and Catalyst accepts it,
        # because HashPartitioning(bucket) satisfies the aggregate's
        # ClusteredDistribution(bucket, repo, path) (partitioning exprs are a
        # subset of the grouping exprs).  Grouping by (bucket, pk) is the
        # same grouping as (pk) — bucket is functionally dependent — so the
        # explicit repartition below is the ONLY exchange in the whole plan,
        # and its bucket alignment flows through the aggregate straight into
        # the partitionBy("bucket") write (one file per bucket, no second
        # shuffle of the merged table).  Trade-off, documented: the partial
        # max_by combine now runs above this exchange, so a batch whose hot
        # KEY carries millions of redundant ops is not pre-collapsed map-side
        # — that shape belongs to the broadcast path, whose LWW aggregate
        # still combines before its own exchange (resolve_lww).
        val = F.struct("op", "commit", "lang", "content", *extras, "extra", "event_id")
        win = (
            src.unionByName(tgt_ops)
            .repartition(_write_width(self.n_buckets), "bucket")
            .groupBy("bucket", *PK_COLUMNS)
            .agg(F.max_by(val, F.col("seq")).alias("v"))
        )
        is_del = F.col("v.op") == "delete"
        out = win.select(
            *PK_COLUMNS,
            *[F.when(is_del, F.lit(None)).otherwise(F.col(f"v.{c}")).alias(c)
              for c in ("commit", "lang", "content")],
            F.col("v.event_id").alias("last_event_id"),
            is_del.alias("is_deleted"),
            *[F.when(is_del, F.lit(None)).otherwise(F.col(f"v.{c}")).alias(c) for c in extras],
            F.when(is_del, F.lit(None)).otherwise(F.col("v.extra")).alias("extra"),
            F.col("bucket"),
        )

        from pyspark.sql import Observation

        obs = Observation(f"merge_{batch_id}")
        out = out.observe(
            obs,
            F.count(F.lit(1)).alias("rows_out"),
            F.sum(F.when(F.col("is_deleted"), 1).otherwise(0)).alias("tombstones"),
            F.max("last_event_id").alias("max_event_id"),
        )
        snap = self._next_snapshot()
        out_dir = os.path.join(self.path, "data", snap)
        (
            # already hash-partitioned on bucket by the single exchange above
            # (2x width: 1 file/bucket, hash collisions thinned) — writing
            # here adds NO further shuffle.
            out.write.partitionBy("bucket")
            .option("compression", _write_codec())
            .mode("overwrite")
            .parquet(out_dir)
        )
        m = obs.get
        written = self._buckets_in(out_dir)
        wall_ms = (time.time() - t0) * 1000

        st = dict(self.state)
        st["snapshot"] = snap
        st["buckets"] = {str(b): snap for b in written}
        st["schemas"] = {snap: out.schema.jsonValue()}
        st["last_event_id"] = max(st["last_event_id"], batch_range[1])
        self._union_gtid(st, gtid_set)
        self._record_applied(st, {"batch_id": batch_id, "min_event_id": batch_range[0],
                                  "max_event_id": batch_range[1], "kind": "merge_fused",
                                  "n_ops": None, "committed_at": time.time(), "wall_ms": wall_ms})
        self._write_snapshot(self._fs, self.path, st)
        self._load_state()
        self._append_lineage(
            {"batch_id": batch_id, "wall_ms": wall_ms, "level": "coarse",
             "metrics": [{"rows_out": m["rows_out"], "tombstones": m["tombstones"],
                          "max_event_id": m["max_event_id"], "buckets": len(written)}],
             "bucket_rows": self._bucket_rows_from_footers(out_dir, written)}
        )
        return {"skipped": False, "batch_id": batch_id, "fused": True, "pre_lww": pre_lww,
                "buckets_rewritten": len(written), "n_ops": None, "wall_ms": wall_ms}

    def _bucket_rows_from_footers(self, out_dir: str, buckets: list[int],
                                  max_buckets: int = 4096) -> dict[str, int] | None:
        """Per-bucket row counts read from parquet FOOTER metadata — pure
        driver-side pyarrow, no Spark job.  Capped: the fused path that
        needs this rewrites every bucket, which only happens at sandbox /
        bootstrap scale; a 16k-bucket steady-state table takes the
        broadcast path whose lineage is exact already."""
        from bifrost_spark.metafs import LocalMetaFS

        if len(buckets) > max_buckets or not isinstance(self._fs, LocalMetaFS):
            return None  # footer probing is a local-FS nicety; coarse
            # observe() lineage stands in on object stores
        try:
            import pyarrow.parquet as pq
        except ImportError:
            return None
        out: dict[str, int] = {}
        for b in buckets:
            d = os.path.join(out_dir, f"bucket={b}")
            try:
                with os.scandir(d) as it:
                    out[str(b)] = sum(
                        pq.ParquetFile(e.path).metadata.num_rows
                        for e in it
                        if e.is_file() and e.name.endswith(".parquet")
                    )
            except (FileNotFoundError, OSError):
                out[str(b)] = -1
        return out

    def quarantine(self, events: DataFrame, batch_id: str, batch_range: tuple[int, int],
                   error: str) -> dict:
        """Dead-letter a poison batch (M9): persist its RAW input events
        under ``_deadletter/<batch_id>/`` for offline repair, then commit a
        ``dead_letter`` manifest entry so the stream proceeds past it with
        the skip on the permanent record — the reference's
        not-must-be-success escape hatch that logs the error and advances
        (/root/reference/server/to_server_consume.go:228-289,
        /root/reference/plugin/mysql/src/mysql.go:610-613).  The quarantined
        range counts as applied (exactly-once bookkeeping stays monotone);
        re-applying the repaired events later goes through the normal merge
        guard, which ignores anything older than what has since landed."""
        self._assert_writable("quarantine")
        dl_dir = os.path.join(self.path, "_deadletter", batch_id.replace(":", "_"))
        events.write.mode("overwrite").parquet(dl_dir)
        st = dict(self.state)
        st["snapshot"] = self._next_snapshot()
        st["last_event_id"] = max(st["last_event_id"], batch_range[1])
        entry = {"batch_id": batch_id, "min_event_id": batch_range[0],
                 "max_event_id": batch_range[1], "kind": "dead_letter",
                 "n_ops": None, "error": error[:2000],
                 "path": dl_dir, "committed_at": time.time()}
        self._record_applied(st, entry)
        # A quarantine record is the ONLY pointer to the unrepaired data, so
        # it lives in its own unbounded list — the applied tail is a bounded
        # ring and would age it out after BIFROST_APPLIED_TAIL commits.
        st["dead_letters"] = st.get("dead_letters", []) + [entry]
        self._write_snapshot(self._fs, self.path, st)
        self._load_state()
        return {"skipped": False, "dead_lettered": True, "batch_id": batch_id,
                "path": dl_dir, "error": error[:500]}

    def dead_letters(self) -> list[dict]:
        """Quarantined batches awaiting repair (permanent record — survives
        the bounded applied tail; entries leave via ``repair_dead_letter``)."""
        return list(self.state.get("dead_letters", []))

    def repair_dead_letter(self, batch_id: str, lww_strategy: str = "agg") -> dict:
        """Re-apply a quarantined batch's raw events (after offline repair /
        a fixed sink) under a fresh ``repair:`` batch id — the original id
        stays on the applied record, so exactly-once bookkeeping is intact
        and the per-key merge guard drops anything that has since been
        superseded by newer events."""
        self._assert_writable("repair_dead_letter")
        from bifrost_spark.operators.lww import events_to_ops

        entry = next((a for a in self.dead_letters() if a["batch_id"] == batch_id), None)
        if entry is None:
            raise KeyError(f"no dead-letter record for batch_id {batch_id!r}; "
                           f"pending: {[a['batch_id'] for a in self.dead_letters()]}")
        events = self.spark.read.parquet(entry["path"])
        res = self.apply_ops(
            events_to_ops(events), batch_id=f"repair:{batch_id}",
            batch_range=(entry["min_event_id"], entry["max_event_id"]),
            lww_strategy=lww_strategy,
        )
        # repaired → retire the quarantine record (the raw events stay on
        # disk under _deadletter/ until vacuumed by the operator)
        st = dict(self.state)
        st["dead_letters"] = [a for a in st.get("dead_letters", [])
                              if a["batch_id"] != batch_id]
        self._write_snapshot(self._fs, self.path, st)
        self._load_state()
        return res

    # ---------------------------------------------------------- maintenance
    def compact(self, tombstone_low_water_mark: int | None = None) -> dict:
        """Table maintenance (Iceberg rewrite_data_files + positional-delete
        compaction, SURVEY.md merge module docstring):

        - rewrites every live bucket into ONE fresh snapshot with one file
          per bucket (merges the file droppings of many small merges);
        - physically materializes the current schema version (old snapshots
          written pre-DDL are null-padded/cast on read; after compaction the
          files carry the current columns);
        - GCs tombstone rows whose ``last_event_id`` ≤ the source low-water
          mark: safe exactly when no replayable batch at-or-below the mark
          remains, because the tombstone's only job is to block a LATE
          lower-event_id upsert from resurrecting a deleted key.

        Commit protocol is the same copy-on-write + atomic CURRENT swing as
        ``merge`` — readers are never torn, and a crash mid-compact leaves
        only an orphan snapshot dir for ``vacuum``.
        """
        self._assert_writable("compact")
        lwm = -1 if tombstone_low_water_mark is None else tombstone_low_water_mark
        cur = self.read(include_deleted=True)
        keep = cur.filter(~F.col("is_deleted") | (F.col("last_event_id") > F.lit(lwm)))
        snap = self._next_snapshot()
        out_dir = os.path.join(self.path, "data", snap)
        (
            keep.repartition(_write_width(self.n_buckets), "bucket")
            .write.partitionBy("bucket")
            .mode("overwrite")
            .parquet(out_dir)
        )
        written = self._buckets_in(out_dir)
        st = dict(self.state)
        st["snapshot"] = snap
        st["buckets"] = {str(b): snap for b in written}
        st["schemas"] = {snap: keep.schema.jsonValue()}
        # high-water purge mark: changelog reads (operators/changes.py) from
        # a snapshot older than this would silently miss purged deletes, so
        # the manifest carries it forward for them to refuse on
        st["tombstone_lwm"] = max(st.get("tombstone_lwm", -1), lwm)
        self._record_applied(st, {"batch_id": f"compact:{snap}", "kind": "compact", "n_ops": 0,
                                  "tombstone_lwm": lwm, "committed_at": time.time()})
        self._write_snapshot(self._fs, self.path, st)
        self._load_state()
        return {"snapshot": snap, "buckets": len(written)}

    def vacuum(self) -> dict:
        """Remove snapshot data dirs no longer referenced by any bucket and
        state files older than CURRENT (orphans from crashes and superseded
        copy-on-write commits).  Safe with live readers only under the
        single-writer assumption readers use a loaded-state handle for —
        like Iceberg's expire_snapshots, callers pick the retention moment."""
        if self._at_snapshot is not None:
            # vacuum deletes files without a snapshot commit, so the
            # _write_snapshot read-only shadow doesn't cover it — guard here
            raise RuntimeError(
                f"table opened read-only via time travel (at_snapshot={self._at_snapshot!r}); "
                "open without at_snapshot to vacuum")
        live = set(self.state["buckets"].values())
        data = os.path.join(self.path, "data")
        removed = []
        for d in self._fs.listdir(data):
            if d not in live:
                self._fs.rmtree(os.path.join(data, d))
                removed.append(d)
        cur = self.state["snapshot"]
        sdir = os.path.join(self.path, "_state")
        for f in self._fs.listdir(sdir):
            if f.endswith(".json") and f != f"{cur}.json":
                self._fs.unlink(os.path.join(sdir, f))
        return {"removed_snapshots": sorted(removed)}

    def _commit_noop(self, batch_id: str, batch_range: tuple[int, int]) -> dict:
        st = dict(self.state)
        st["snapshot"] = self._next_snapshot()
        st["last_event_id"] = max(st["last_event_id"], batch_range[1])
        self._record_applied(st, {"batch_id": batch_id, "min_event_id": batch_range[0],
                                  "max_event_id": batch_range[1], "kind": "noop", "n_ops": 0,
                                  "committed_at": time.time()})
        self._write_snapshot(self._fs, self.path, st)
        self._load_state()
        return {"skipped": False, "batch_id": batch_id, "n_ops": 0}

    # ------------------------------------------------------------------ DDL
    def apply_ddl(self, query: str, batch_id: str, event_id: int,
                  range_exclusive: bool = False, defer_lwm: bool = False) -> dict:
        """Schema evolution — metadata-only commit (Iceberg-style).

        ADD/MODIFY/CHANGE/DROP COLUMN bump the registry; data files are not
        rewritten (reads align).  TRUNCATE clears the bucket map.  Mirrors
        the reference's ALTER transfer + cache invalidation
        (/root/reference/plugin/clickhouse/src/alter_sql.go:59-330,
        /root/reference/Bristol/mysql/conn_dump.go:196-203).
        """
        if self.is_applied(batch_id, (event_id, event_id), range_exclusive):
            return {"skipped": True, "batch_id": batch_id}
        new_v = self.registry.apply_ddl(query)
        st = dict(self.state)
        st["snapshot"] = self._next_snapshot()
        st["registry"] = self.registry.to_dict()
        st["schema_version"] = new_v.version
        if new_v.truncated or new_v.dropped:
            # TRUNCATE empties the table; DROP TABLE additionally evicted the
            # cached schema (registry.apply_ddl) — both clear the bucket map
            st["buckets"] = {}
        if not defer_lwm:
            # defer_lwm=True: a DDL-barrier FOLD (ReplayEngine) is about to
            # merge the small pre-DDL remainder segment together with the
            # post-DDL segment; advancing the high-water mark past the DDL id
            # here would mark those still-unapplied pre-DDL events stale on a
            # crash-resume.  The folded merge's own commit advances it.
            st["last_event_id"] = max(st["last_event_id"], event_id)
        self._record_applied(st, {"batch_id": batch_id, "min_event_id": event_id,
                                  "max_event_id": event_id, "kind": "ddl", "query": query,
                                  "n_ops": 0, "committed_at": time.time()})
        self._write_snapshot(self._fs, self.path, st)
        self._load_state()
        return {"skipped": False, "batch_id": batch_id, "schema_version": new_v.version}
