"""Object-store-capable metadata I/O: the full engine must run against a
``scheme://`` table root through the Hadoop FileSystem API (exercised with
file:// — the same JVM code path s3a:// and hdfs:// take, minus the
connector jar)."""

from pyspark.sql import functions as F

from bifrost_spark.generator import GeneratorConfig, generate_events, generate_snapshot, write_event_log
from bifrost_spark.metafs import HadoopMetaFS, LocalMetaFS, metafs_for
from bifrost_spark.operators.merge import TargetTable
from bifrost_spark.pipelines.replay import replay_event_log


def test_scheme_selection(spark, tmp_path):
    assert isinstance(metafs_for(spark, str(tmp_path)), LocalMetaFS)
    assert isinstance(metafs_for(spark, f"file://{tmp_path}"), HadoopMetaFS)
    assert isinstance(metafs_for(spark, "s3a://bucket/tbl"), HadoopMetaFS)


def test_hadoop_metafs_primitives(spark, tmp_path):
    fs = HadoopMetaFS(spark, f"file://{tmp_path}")
    base = f"file://{tmp_path}/meta"
    fs.makedirs(base)
    fs.write_text_atomic(f"{base}/CURRENT", "v01")
    assert fs.read_text(f"{base}/CURRENT") == "v01"
    fs.write_text_atomic(f"{base}/CURRENT", "v02")  # overwrite via delete+rename
    assert fs.read_text(f"{base}/CURRENT") == "v02"
    fs.append_line(f"{base}/lineage.jsonl", '{"a":1}')
    fs.append_line(f"{base}/lineage.jsonl", '{"a":2}')
    assert [ln for ln in fs.read_lines(f"{base}/lineage.jsonl") if ln.strip()] == ['{"a":1}', '{"a":2}']
    assert "CURRENT" in fs.listdir(base)
    assert fs.dir_size(base) > 0
    assert fs.exists(f"{base}/CURRENT")
    fs.unlink(f"{base}/CURRENT")
    assert not fs.exists(f"{base}/CURRENT")


def test_engine_end_to_end_on_file_uri_root(spark, tmp_path):
    """Replay the full pipeline against a file:// table root: every metadata
    operation (snapshots, CURRENT swings, lineage, bucket sizing, vacuum)
    runs through HadoopMetaFS; the final state must equal a plain-path run."""
    cfg = GeneratorConfig(n_events=2000, n_keys=200, n_repos=10, seed=31, snapshot_keys=100,
                          ddl=[(1000, "ALTER TABLE code.repos ADD COLUMN stars INT")])
    log = str(tmp_path / "log")
    write_event_log(generate_events(spark, cfg), log, n_chunks=2)

    uri_root = f"file://{tmp_path}/tbl_uri"
    t1 = TargetTable.create(spark, uri_root, n_buckets=4)
    assert isinstance(t1._fs, HadoopMetaFS)
    t1.bootstrap(generate_snapshot(spark, cfg))
    replay_event_log(spark, log, t1)
    t1.compact(tombstone_low_water_mark=t1.last_event_id)
    t1.vacuum()

    t2 = TargetTable.create(spark, str(tmp_path / "tbl_local"), n_buckets=4)
    t2.bootstrap(generate_snapshot(spark, cfg))
    replay_event_log(spark, log, t2)

    a = t1.read().select("repo", "path", F.sha2("content", 256).alias("sha"), "last_event_id")
    b = t2.read().select("repo", "path", F.sha2("content", 256).alias("sha"), "last_event_id")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # reopen from the URI root (metadata reads through the JVM FS)
    t1b = TargetTable(spark, uri_root)
    assert t1b.last_event_id == t1.last_event_id
    assert t1b.read().count() == t1.read().count()
