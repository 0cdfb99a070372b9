"""Multi-table sync topology e2e: ONE change stream carrying several tables,
routed by the F1/F7 wildcard filters into per-table TargetTables — the
reference's central deployment shape (a channel tails one binlog and fans
rows out to independently-configured table sinks,
/root/reference/server/callback.go:78-140 routing +
/root/reference/server/channel_consume.go:265-317 per-sink consume).

Each table's final state must equal the sequential-apply oracle of ITS OWN
slice of the stream; the do/ignore wildcard config decides the membership.
"""

from pyspark.sql import functions as F

from bifrost_spark.generator import GeneratorConfig, generate_events
from bifrost_spark.operators.filters import replicate_table_filter
from bifrost_spark.operators.merge import TargetTable
from bifrost_spark.oracle import content_sha_map, sequential_apply
from bifrost_spark.pipelines.replay import ReplayEngine

CFG = GeneratorConfig(n_events=3000, n_keys=300, n_repos=20, seed=17, snapshot_keys=0)


def _multi_stream(spark):
    """One ordered stream over three tables: the generator's code.repos rows
    re-labelled deterministically (repos / repos_archive / app.users)."""
    ev = generate_events(spark, CFG)
    mod = F.pmod(F.col("event_id"), F.lit(3))
    return ev.withColumn(
        "schema_name", F.when(mod == 2, F.lit("app")).otherwise(F.col("schema_name"))
    ).withColumn(
        "table_name",
        F.when(mod == 0, F.lit("repos"))
        .when(mod == 1, F.lit("repos_archive"))
        .otherwise(F.lit("users")),
    )


def test_wildcard_routed_tables_each_match_their_slice(spark, tmp_path):
    events = _multi_stream(spark)
    sinks = {
        # exact table
        "t_repos": dict(do_tables=["code.repos"]),
        # wildcard with ignore precedence: code.* minus the archive
        "t_code_live": dict(do_tables=["code.*"], ignore_tables=["code.repos_archive"]),
        # cross-schema catch-all minus one schema
        "t_all_but_app": dict(do_tables=["*.*"], ignore_tables=["app.*"]),
    }
    for name, route in sinks.items():
        routed = replicate_table_filter(events, **route)
        expected = sequential_apply(routed.toPandas())
        table = TargetTable.create(spark, str(tmp_path / name), n_buckets=4)
        ReplayEngine(table, ordered=True).apply_batch(routed)
        actual = table.to_pandas_sorted().reset_index(drop=True)
        assert content_sha_map(actual) == content_sha_map(expected), name
        assert expected.equals(actual[expected.columns.tolist()]), name

    # membership algebra: live = repos ∪ (code.* \ archive); repos ⊂ code_live
    n_repos = replicate_table_filter(events, do_tables=["code.repos"]).count()
    n_live = replicate_table_filter(events, do_tables=["code.*"],
                                    ignore_tables=["code.repos_archive"]).count()
    assert n_repos == n_live  # archive excluded, users is app.* → same set


def test_routing_is_scan_pushed(spark):
    """The wildcard predicate must reach the parquet scan as a pushed/partition
    filter shape (foldable regex + equality), not a post-scan Python step."""
    events = _multi_stream(spark)
    routed = replicate_table_filter(events, do_tables=["code.*"],
                                    ignore_tables=["code.repos_archive"])
    plan = routed._jdf.queryExecution().executedPlan().toString()
    assert "pythonUDF" not in plan and "BatchEvalPython" not in plan
