"""Scaling-efficiency evidence: the same CDC replay at two parallelism
levels (local[8] = N cores vs local[32] = 4N cores), fresh JVM each, on the
IDENTICAL generated input.  Writes BENCH/BASELINE.md.

This is the in-sandbox stand-in for the north rule's two-cluster-size
criterion (N vs 4N executors): throughput_4N / (4 × throughput_N) ≥ 0.8.

Usage: python tools/bench_scaling.py [n_events]
"""

from __future__ import annotations

import datetime
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, shutil, sys, time
sys.path.insert(0, {repo!r})
from bifrost_spark.session import get_spark
from bifrost_spark.generator import GeneratorConfig, generate_events, generate_snapshot, write_event_log
from bifrost_spark.operators.merge import TargetTable
from bifrost_spark.pipelines.replay import replay_event_log

cores = int(sys.argv[1]); n_events = int(sys.argv[2]); n_chunks = int(sys.argv[3])
spark = get_spark("bifrost-scaling", master=f"local[{{cores}}]", shuffle_partitions=cores)
spark.sparkContext.setLogLevel("ERROR")
# identical input both runs: data layout (chunks, files, buckets) is fixed,
# only the executor parallelism differs — the N vs 4N cluster stand-in.
cfg = GeneratorConfig(n_events=n_events, n_keys=max(n_events // 10, 1000),
                      n_repos=max(50, n_events // 2000), seed=42,
                      snapshot_keys=max(n_events // 20, 500),
                      ddl=[(n_events // 2, "ALTER TABLE code.repos ADD COLUMN stars INT")])
work = os.path.join({repo!r}, ".tmp", f"scaling_{{cores}}")
shutil.rmtree(work, ignore_errors=True)
log = os.path.join(work, "log")
write_event_log(generate_events(spark, cfg), log, n_chunks=n_chunks, files_per_chunk=32)
table = TargetTable.create(spark, os.path.join(work, "tbl"), n_buckets=64)
table.bootstrap(generate_snapshot(spark, cfg))
t0 = time.time()
replay_event_log(spark, log, table)
wall = time.time() - t0
n = table.read().count()
shutil.rmtree(work, ignore_errors=True)
print(json.dumps({{"cores": cores, "wall_sec": wall, "events_per_sec": n_events / wall,
                  "n_events": n_events, "final_rows": n}}))
"""


def run(cores: int, n_events: int, n_chunks: int) -> dict:
    script = CHILD.format(repo=REPO)
    out = subprocess.run(
        [sys.executable, "-c", script, str(cores), str(n_events), str(n_chunks)],
        capture_output=True, text=True, check=True, cwd=REPO,
    )
    line = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else int(os.environ.get("BENCH_EVENTS", "4000000"))
    n_chunks = int(sys.argv[2]) if len(sys.argv) > 2 else int(os.environ.get("BENCH_CHUNKS", "4"))
    r8 = run(8, n_events, n_chunks)
    r32 = run(32, n_events, n_chunks)
    eff = r32["events_per_sec"] / (4 * r8["events_per_sec"])
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    md = f"""# BENCH/BASELINE — CDC apply throughput & scaling efficiency

Generated {datetime.datetime.now(datetime.UTC).isoformat()} by tools/bench_scaling.py.

Same job, same deterministic input ({n_events:,} change events in {n_chunks}
micro-batches, seed 42, zipf-skewed repos, 1 DDL barrier), two parallelism
levels in fresh JVMs — the sandbox stand-in for N vs 4N executor clusters
(BASELINE.json north rule).

| parallelism | wall sec | events/sec | final rows |
|---|---|---|---|
| local[8]  (N)  | {r8['wall_sec']:.2f} | {r8['events_per_sec']:,.0f} | {r8['final_rows']:,} |
| local[32] (4N) | {r32['wall_sec']:.2f} | {r32['events_per_sec']:,.0f} | {r32['final_rows']:,} |

**Scaling efficiency** = throughput_4N / (4 × throughput_N) =
{r32['events_per_sec']:,.0f} / (4 × {r8['events_per_sec']:,.0f}) = **{eff:.3f}**
(target ≥ 0.8 per BASELINE.json; note both runs share one machine's memory
bandwidth + disk, which a real 4N-executor cluster would not).

Raw: `{json.dumps(r8)}` / `{json.dumps(r32)}`
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(json.dumps({"n8": r8, "n32": r32, "scaling_efficiency": round(eff, 3)}))


if __name__ == "__main__":
    main()
