"""GTID-executed manifest view + GTID-first resume.

Reference parity: COM_BINLOG_DUMP_GTID reconnects with the slave's executed
set (/root/reference/Bristol/mysql/conn_dump.go:32-95); our manifests
export ``gtid_executed`` and ``gtid_resume_chunk`` picks the reconnect
point from it."""

from bifrost_spark.generator import GeneratorConfig, generate_events, generate_snapshot, write_event_log
from bifrost_spark.gtid import GtidSet
from bifrost_spark.operators.merge import TargetTable
from bifrost_spark.pipelines.replay import gtid_resume_chunk, replay_event_log


def test_gtid_executed_accumulates_and_resume_picks_gap(spark, tmp_path):
    cfg = GeneratorConfig(n_events=4000, n_keys=400, n_repos=10, seed=21, snapshot_keys=100)
    log = str(tmp_path / "log")
    write_event_log(generate_events(spark, cfg), log, n_chunks=4)
    table = TargetTable.create(spark, str(tmp_path / "tbl"), n_buckets=8)
    table.bootstrap(generate_snapshot(spark, cfg))

    # replay only the first 2 chunks, then "reconnect"
    replay_event_log(spark, log, table, end_chunk=2)
    executed = GtidSet.parse(table.gtid_executed)
    assert executed.sets, "manifest must export a gtid_executed view"
    # resume point = first chunk whose gtid range is not contained
    assert gtid_resume_chunk(log, table) == 2

    table2 = TargetTable(spark, table.path)  # reopen from disk
    replay_event_log(spark, log, table2, start_chunk=gtid_resume_chunk(log, table2))
    assert gtid_resume_chunk(log, table2) == 4  # everything contained now

    # final executed set covers the full event range contiguously
    final = GtidSet.parse(table2.gtid_executed)
    lo = min(lo for ivs in final.sets.values() for lo, _ in ivs)
    hi = max(hi for ivs in final.sets.values() for _, hi in ivs)
    assert lo == 2 and hi == 8000  # event ids 2..2*n_events
    # and the subtract form answers "what would a new source need to send"
    assert final.subtract(table2.gtid_executed).sets == {}
