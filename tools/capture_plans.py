"""Capture .explain('formatted') for every declared query (and the
bench-entry plans) into plans/r12/<name>_<tag>.txt — the optimization
round's evidence files. Planning only: no job is ever submitted.

Usage: python tools/capture_plans.py <tag> [name ...]
  tag: 'before' / 'after'
  names: optional subset (default: all declared queries + bench entries)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
# round dir: SPARK_GRAFT_PLANS_ROUND=rNN (default the current round)
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r13"),
)


def main() -> None:
    # planning-only tool: background checkpoint prefetch would submit
    # real jobs during construction (io.prefetch_checkpoint opt-out)
    os.environ.setdefault("SPARK_GRAFT_NO_PREFETCH", "1")
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:]) or None
    os.makedirs(OUT_DIR, exist_ok=True)

    from pg2kinesis_spark.plans import QUERIES
    from pg2kinesis_spark.session import get_spark

    spark = get_spark("capture_plans")

    import bench

    entries: dict = {}
    for name, fn in QUERIES.items():
        entries[name] = lambda fn=fn: fn(spark, SF_DIR)
    for name, fn in bench.EXTRA_BENCHES.items():
        if name == "ingest_batch":
            continue
        entries[name] = lambda fn=fn: fn(spark, SF_DIR)

    for name, build in entries.items():
        if only and name not in only:
            continue
        try:
            df = build()
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # pragma: no cover - capture tool
            txt = f"PLAN CAPTURE FAILED: {type(e).__name__}: {e}"
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(txt)
        n_ex = txt.count("Exchange")
        n_py = txt.count("EvalPython") + txt.count("MapInArrow") + txt.count("MapInPandas") + txt.count("ArrowEval")
        print(f"{name}: exchanges~{n_ex} python_nodes~{n_py} -> {path}")


if __name__ == "__main__":
    main()
