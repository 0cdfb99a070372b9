"""Replay engine: ordered change-event batches → LWW → MERGE, DDL barriers.

This is the Spark-side equivalent of the reference's consume loop
(/root/reference/server/to_server_consume.go:50-484): a micro-batch replaces
the bounded queue + 500-event sink transaction
(/root/reference/plugin/mysql/src/mysql.go:482-668), and the DDL-as-barrier
rule replaces its synthetic BEGIN/COMMIT around DDL
(/root/reference/Bristol/mysql/conn_dump.go:242-277): a merge never mixes
two schema versions of one table (SURVEY.md §7 "DDL barrier").

``apply_batch`` takes ANY set of events (a chunk, a streaming micro-batch,
an overlapping replay) and is idempotent: segment batch_ids derive from the
actual event_id range, and the TargetTable manifest skips applied ranges.
DDL events are collected driver-side — there are only ever a handful per
stream — while all row data stays distributed.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bifrost_spark.operators.lww import events_to_ops
from bifrost_spark.operators.merge import TargetTable
from bifrost_spark.schemas import EVENT_SCHEMA


def _gtid_range(first: str | None, last: str | None) -> str | None:
    """Source-hint GTID range → a GtidSet string ``uuid:txid_lo-txid_hi``
    for the manifest's gtid_executed view.  Only emitted when both ends
    carry the same source uuid and numeric txids (single-source binlog
    semantics: the txid sequence within one uuid is gap-free, which is what
    makes the range form exact)."""
    try:
        u1, t1 = (first or "").rsplit(":", 1)
        u2, t2 = (last or "").rsplit(":", 1)
        if u1 and u1 == u2:
            return f"{u1}:{int(t1)}-{int(t2)}"
    except ValueError:
        pass
    return None


class ReplayEngine:
    def __init__(self, table: TargetTable, lww_strategy: str = "agg", ordered: bool = True,
                 auto_compact_snapshots: int | None = None,
                 on_error: str = "fail", max_retries: int = 2):
        # ordered=True: batches arrive in global event_id order (the chunked
        # replay driver sorts chunks) → the F9 stale-event skip below is safe
        # and makes re-delivered prefixes true no-ops.  ordered=False (e.g. a
        # streaming file source, which does NOT guarantee file order):
        # correctness falls back to manifests + the commutative
        # tombstone/guard merge; no high-water-mark skipping.
        #
        # auto_compact_snapshots=N: after a batch, if the table's live
        # buckets span more than N snapshots (each adds one scan+union to
        # every read), compact + vacuum.  In ordered mode the stale-event
        # skip guarantees nothing at-or-below last_event_id can ever land,
        # so it doubles as a SAFE tombstone-GC low-water mark; unordered
        # mode compacts without tombstone GC (a late batch may still need
        # the tombstone guard).
        # on_error: "fail" = the reference's must-be-success mode (raise after
        # max_retries, operator intervenes); "dead_letter" = quarantine the
        # poison batch's raw events + commit an explicit skip record, stream
        # proceeds (/root/reference/server/to_server_consume.go:228-289).
        # Retries re-run the whole idempotent merge — a transient failure
        # (executor loss, storage hiccup) succeeds on a later attempt with
        # no duplicate effects because the commit point is the atomic
        # CURRENT swing.
        self.table = table
        self.lww_strategy = lww_strategy
        self.ordered = ordered
        self.auto_compact_snapshots = auto_compact_snapshots
        self.on_error = on_error
        self.max_retries = max_retries

    def maybe_maintain(self) -> dict | None:
        n = self.auto_compact_snapshots
        if n is None:
            return None
        live = set(self.table.state["buckets"].values())
        if len(live) <= n:
            return None
        lwm = self.table.last_event_id if self.ordered else None
        res = self.table.compact(tombstone_low_water_mark=lwm)
        res["vacuum"] = self.table.vacuum()
        res["kind"] = "auto_compact"
        return res

    def apply_batch(self, events: DataFrame, hints: dict | None = None) -> list[dict]:
        """Apply one micro-batch: split at DDL barriers, then per segment
        resolve-LWW + MERGE; DDLs commit as metadata-only snapshots in
        event_id order.

        Driver-job economy (this matters for scaling efficiency — each
        driver-synchronized Spark job carries fixed scheduling latency that
        extra cores cannot reduce): with source-supplied ``hints``
        (``{"n_data", "lo", "hi", "ddls"}`` — a binlog source knows its
        position range and sees DDLs inline; ``write_event_log`` persists
        them as ``_chunks.json``), the common no-DDL batch runs ZERO
        pre-scan jobs — only the merge itself.  Without hints, ONE
        column-pruned aggregation job yields everything the planner needs —
        the DDL list, the live-event count, and the event_id range with the
        stale-skip high-water mark already applied.  Hints are trusted only
        when the whole batch is ahead of the committed high-water mark;
        a partially-replayed batch (crash resume) falls back to the scan.
        """
        lwm = self.table.last_event_id if self.ordered else -1
        is_data = F.col("event_type").isin("insert", "update", "delete")
        live = is_data & (F.col("event_id") > F.lit(lwm))
        if (
            hints is not None
            and hints.get("segments") is not None
            and all(s["lo"] > lwm for s in hints["segments"])
        ):
            # Fully-indexed batch: per-segment ranges + inline DDL list from
            # the source — zero pre-scan jobs, no event caching, even across
            # DDL barriers.  Items apply in event_id order (a DDL's odd id
            # falls between the segment ranges it separates).
            items: list[tuple[str, dict]] = [("seg", s) for s in hints["segments"]] + [
                ("ddl", d) for d in hints.get("ddls", [])
            ]
            items.sort(key=lambda t: t[1]["lo"] if t[0] == "seg" else t[1]["event_id"])
            items = self._fold_ddl_barriers(items)
            results: list[dict] = []
            for kind, item in items:
                if kind == "seg":
                    seg_df = events.filter(
                        is_data & F.col("event_id").between(item["lo"], item["hi"])
                    )
                    results.extend(self._merge_segment(
                        seg_df, n=item["n_data"], lo=item["lo"], hi=item["hi"],
                        gtid_set=_gtid_range(item.get("gtid_first"), item.get("gtid_last")),
                        keys_est=item.get("keys_est"),
                    ))
                else:
                    results.append(self.table.apply_ddl(
                        item["query"], batch_id=f"ddl:{item['event_id']}",
                        event_id=item["event_id"], range_exclusive=self.ordered,
                        defer_lwm=(kind == "ddl_deferred"),
                    ))
            return results
        # Scan path (no source hints — the streaming file stream, an external
        # caller): the batch is consumed at least twice (this stats agg, then
        # the merge), so persist it — the stats agg materializes the cache
        # and every later consumer reads memory instead of re-scanning the
        # source.  Also what makes the stream's numInputRows metric equal
        # the true event count (one source scan per micro-batch).
        t0 = time.time()
        events = events.persist()
        try:
            from bifrost_spark.operators.lww import lww_key_expr

            lww_key = lww_key_expr()
            stats = events.agg(
                F.count(F.when(live, 1)).alias("n"),
                F.min(F.when(live, F.col("event_id"))).alias("lo"),
                F.max(F.when(live, F.col("event_id"))).alias("hi"),
                F.approx_count_distinct(F.when(live, lww_key)).alias("keys_est"),
                F.sort_array(
                    F.collect_list(F.when(F.col("event_type") == "ddl", F.struct("event_id", "query")))
                ).alias("ddls"),
            ).collect()[0]
            ddls = list(stats["ddls"])
            stats_ms = (time.time() - t0) * 1000

            if not ddls:
                return self._merge_segment(
                    events.filter(live), n=stats["n"], lo=stats["lo"], hi=stats["hi"],
                    stats_ms=stats_ms, keys_est=stats["keys_est"],
                )

            # DDL barrier path: segment the batch so a merge never mixes two
            # schema versions of one table.  DDLs are rare; the per-segment
            # agg is acceptable here and events stay cached across segments.
            results: list[dict] = []
            bounds = [-1] + [r["event_id"] for r in ddls] + [None]
            for i in range(len(bounds) - 1):
                lo, hi = bounds[i], bounds[i + 1]
                seg = events.filter(live).filter(F.col("event_id") > lo)
                if hi is not None:
                    seg = seg.filter(F.col("event_id") < hi)
                results.extend(self._merge_segment(seg))
                if hi is not None:
                    ddl = ddls[i]
                    results.append(
                        self.table.apply_ddl(ddl["query"], batch_id=f"ddl:{ddl['event_id']}",
                                             event_id=ddl["event_id"], range_exclusive=self.ordered)
                    )
            return results
        finally:
            events.unpersist()

    def _fold_ddl_barriers(self, items: list[tuple[str, dict]]) -> list[tuple[str, dict]]:
        """Collapse the [tiny pre-DDL remainder segment, schema-evolution
        DDL, next segment] pattern into [deferred DDL, one merged segment].

        A chunk boundary rarely coincides with a DDL, so a DDL mid-chunk
        leaves a remainder segment on its left — often a handful of events
        (the bench shape: ONE event) — that would otherwise pay a full merge
        commit cycle (~0.3-0.6 s of fixed driver/job cost at local[32]) for
        almost no data.  For schema-evolution DDLs whose semantics commute
        with the align-on-read registry (ADD/DROP/MODIFY COLUMN — a pre-DDL
        row merged under the NEW schema version null-pads / drops / casts to
        exactly the state sequential apply reaches), the barrier is not
        needed for correctness: apply the DDL first (metadata-only, with the
        high-water mark DEFERRED so a crash-resume cannot mark the pre-DDL
        events stale — see TargetTable.apply_ddl), then merge both segments
        as one.  Renames (CHANGE COLUMN) and table-level DDL
        (TRUNCATE/DROP/CREATE/RENAME) keep the strict barrier: their effect
        does not commute with ops ordered before them.

        BIFROST_DDL_FOLD_MAX (events; default 65536, 0 disables) bounds the
        folded remainder so large pre-DDL segments keep the conservative
        barrier behavior."""
        try:
            fold_max = int(os.environ.get("BIFROST_DDL_FOLD_MAX", "65536"))
        except ValueError:
            fold_max = 65536
        if fold_max <= 0 or len(items) < 3:
            return items
        from bifrost_spark.ddl import classify_query

        safe_kinds = {"add_column", "drop_column", "modify_column"}

        def evolution_safe(query: str) -> bool:
            op = classify_query(query)
            if not op.is_ddl:
                return False
            kinds = [s.kind for s in op.sections] if op.kind == "alter_multi" else [op.kind]
            return bool(kinds) and all(k in safe_kinds for k in kinds)

        out = list(items)
        i = 0
        while i + 2 < len(out):
            a_kind, a = out[i]
            d_kind, d = out[i + 1]
            b_kind, b = out[i + 2]
            if (
                a_kind == "seg" and d_kind == "ddl" and b_kind == "seg"
                and a["n_data"] <= fold_max
                and evolution_safe(d["query"])
            ):
                merged = {
                    "lo": a["lo"], "hi": b["hi"],
                    "n_data": a["n_data"] + b["n_data"],
                    "keys_est": (a["keys_est"] + b["keys_est"])
                    if a.get("keys_est") is not None and b.get("keys_est") is not None
                    else None,
                    "gtid_first": a.get("gtid_first"),
                    "gtid_last": b.get("gtid_last"),
                }
                out[i : i + 3] = [("ddl_deferred", d), ("seg", merged)]
                # re-examine from the merged segment: it may precede another
                # foldable DDL (but usually exceeds fold_max by now)
                i += 1
            else:
                i += 1
        return out

    def _merge_segment(self, seg: DataFrame, n: int | None = None,
                       lo: int | None = None, hi: int | None = None,
                       stats_ms: float = 0.0, gtid_set: str | None = None,
                       keys_est: int | None = None) -> list[dict]:
        # F9 stale-event skip (reference: channel_consume.go:300-314): a
        # redelivered batch — even one sliced differently than the original
        # (checkpoint wipe, changed trigger size) — contributes nothing below
        # the committed high-water mark, so replays are true no-ops rather
        # than guard-protected rewrites.  Only valid under ordered delivery;
        # apply_batch bakes the filter into ``live`` for the fast path.
        if n is None:
            if self.ordered:
                seg = seg.filter(F.col("event_id") > F.lit(self.table.last_event_id))
            from bifrost_spark.operators.lww import lww_key_expr

            r = seg.agg(F.min("event_id").alias("lo"), F.max("event_id").alias("hi"),
                        F.count("*").alias("n"),
                        F.approx_count_distinct(lww_key_expr()).alias("keys_est")).collect()[0]
            n, lo, hi, keys_est = r["n"], r["lo"], r["hi"], r["keys_est"]
        if n == 0:
            return []
        batch_id = f"merge:{lo}-{hi}"
        if self.table.is_applied(batch_id, (lo, hi), range_exclusive=self.ordered):
            return [{"skipped": True, "batch_id": batch_id}]
        last_err: Exception | None = None
        for attempt in range(self.max_retries + 1):
            try:
                res = self.table.apply_ops(
                    events_to_ops(seg), batch_id=batch_id, batch_range=(lo, hi),
                    n_ops_hint=n, n_keys_hint=keys_est, lww_strategy=self.lww_strategy,
                    range_exclusive=self.ordered, gtid_set=gtid_set,
                )
                res["stats_ms"] = round(stats_ms, 1)
                if attempt:
                    res["retries"] = attempt
                return [res]
            except Exception as e:  # noqa: BLE001 — sink/task failures of any shape
                last_err = e
        if self.on_error != "dead_letter":
            raise last_err
        return [self.table.quarantine(seg, batch_id, (lo, hi), error=repr(last_err))]


def gtid_resume_chunk(log_path: str, table: TargetTable) -> int:
    """GTID-first resume (the reference's COM_BINLOG_DUMP_GTID semantics,
    /root/reference/Bristol/mysql/conn_dump.go:32-95 + mysql_gtid.go): find
    the first chunk whose GTID range is NOT fully contained in the table's
    ``gtid_executed``, i.e. where a slave reconnecting with
    ``@slave_connect_state = gtid_executed`` would be resumed.  Falls back
    to 0 when the log carries no chunk index or no gtids (position-based
    resume via manifests still applies)."""
    from bifrost_spark.gtid import GtidSet
    from bifrost_spark.metafs import load_chunk_index

    index = load_chunk_index(log_path, spark=table.spark)
    if not index:
        return 0
    executed = GtidSet.parse(table.gtid_executed)
    for i, chunk in enumerate(sorted(index)):
        rng = _gtid_range(index[chunk].get("gtid_first"), index[chunk].get("gtid_last"))
        if rng is None or not executed.contains(rng):
            return i
    return len(index)


def replay_event_log(
    spark: SparkSession,
    log_path: str,
    table: TargetTable,
    lww_strategy: str = "agg",
    start_chunk: int = 0,
    end_chunk: int | None = None,
    ordered: bool = True,
    auto_compact_snapshots: int | None = None,
) -> list[dict]:
    """Chunked batch replay of a ``write_event_log`` directory in order —
    the micro-batch emulation driver (SURVEY.md §7 step 3).  ``start_chunk``
    lets a killed run resume; re-running committed chunks is a no-op via
    manifests (exactly-once)."""
    from bifrost_spark.metafs import load_chunk_index, metafs_for

    engine = ReplayEngine(table, lww_strategy, ordered=ordered,
                          auto_compact_snapshots=auto_compact_snapshots)
    chunks = sorted(d for d in metafs_for(spark, log_path).listdir(log_path)
                    if d.startswith("chunk="))
    index = load_chunk_index(log_path, spark=spark)
    results: list[dict] = []
    for chunk in chunks[start_chunk:end_chunk]:
        # explicit schema: chunk files carry exactly EVENT_SCHEMA, and
        # skipping footer inference saves one driver job per micro-batch.
        df = spark.read.schema(EVENT_SCHEMA).parquet(os.path.join(log_path, chunk))
        results.extend(engine.apply_batch(df, hints=index.get(chunk)))
        m = engine.maybe_maintain()
        if m is not None:
            results.append(m)
    return results
