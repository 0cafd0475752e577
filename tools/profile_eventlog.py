"""Event-log decomposition of a scaling_bench op: wall seconds vs
summed task run time vs job/stage counts — adjudicates barrier-bound
vs compute-bound (guide §1/§7; the r13 curate 8v32 inversion run).

Usage: [SPARK_GRAFT_CPUS=N] python tools/profile_eventlog.py [op] [rows]
  op:   scaling_bench op name (default curate)
  rows: replica-blown corpus size (default 250000; the corpus must
        already exist at /tmp/scaling_docs_<rows>.parquet — run
        tools/scaling_bench.py once to build it)

Prints two JSON lines: the run (wall, out rows) and the decomposition
(jobs, tasks, summed executor run time, GC, ideal parallel seconds,
summed stage wall). Executor Run Time is wall-clock per task, so
hypervisor steal inflates it — compare runs probe-to-probe.
"""
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

op_name = sys.argv[1] if len(sys.argv) > 1 else "curate"
rows = int(sys.argv[2]) if len(sys.argv) > 2 else 250000
cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
evdir = f"/tmp/spark-events-{op_name}-{rows}"
os.makedirs(evdir, exist_ok=True)
for f in glob.glob(evdir + "/*"):
    if os.path.isfile(f):
        os.remove(f)

# mirrors session.get_spark plus the event log (get_spark can't take
# per-call confs and this is a diagnostic, not a bench surface)
spark = (
    SparkSession.builder.master(f"local[{cpus}]")
    .appName(f"profile_eventlog_{op_name}")
    .config("spark.sql.shuffle.partitions", str(cpus))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    .config("spark.ui.enabled", "false")
    .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
    .config("spark.eventLog.enabled", "true")
    .config("spark.eventLog.dir", evdir)
    .config("spark.eventLog.compress", "false")
    .config("spark.eventLog.rolling.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("WARN")
spark.range(1000000).selectExpr("sum(id)").collect()  # JVM warm-up

from tools.scaling_bench import OPS  # noqa: E402

docs = spark.read.parquet(f"/tmp/scaling_docs_{rows}.parquet")
t0 = time.perf_counter()
n = OPS[op_name](spark, docs).count()
wall = time.perf_counter() - t0
print(json.dumps({"cpus": cpus, "op": op_name, "rows": rows, "out": n,
                  "wall_s": round(wall, 2)}))
spark.stop()
time.sleep(2)

run_ms = gc_ms = task_n = jobs = 0
stages = []
for path in glob.glob(evdir + "/*"):
    if not os.path.isfile(path):
        continue
    for line in open(path):
        try:
            ev = json.loads(line)
        except Exception:  # noqa: BLE001
            continue
        e = ev.get("Event")
        if e == "SparkListenerTaskEnd":
            m = ev.get("Task Metrics") or {}
            run_ms += m.get("Executor Run Time", 0)
            gc_ms += m.get("JVM GC Time", 0)
            task_n += 1
        elif e == "SparkListenerJobStart":
            jobs += 1
        elif e == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            sub, comp = si.get("Submission Time"), si.get("Completion Time")
            if sub and comp:
                stages.append((comp - sub) / 1000.0)
print(json.dumps({
    "jobs": jobs,
    "tasks": task_n,
    "sum_task_run_s": round(run_ms / 1000.0, 2),
    "sum_gc_s": round(gc_ms / 1000.0, 2),
    "ideal_parallel_s": round(run_ms / 1000.0 / cpus, 2),
    "sum_stage_wall_s": round(sum(stages), 2),
    "n_stages": len(stages),
}))
