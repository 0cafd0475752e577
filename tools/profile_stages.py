"""Stage-decomposition profiler for the composite bench entries —
times cumulative pipeline prefixes with the noop sink (guide §1.4) so
the computation is measured, not the sink. Run EXCLUSIVELY.

Usage: python tools/profile_stages.py <which> [reps]
  which: url | curate_max | dsir | bm25 | lm
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _noop(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def _probe() -> float:
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        acc = 0
        for i in range(10**7):
            acc += i * i
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    which = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    from pg2kinesis_spark.session import get_spark

    spark = get_spark("profile_stages")
    spark.range(1000000).selectExpr("sum(id)").collect()
    print(f"probe_before={_probe()}")

    stages: dict = {}
    if which == "url":
        import bench
        from pyspark.sql import functions as F

        from pg2kinesis_spark.functions import urls as U
        from pg2kinesis_spark.io import load_table

        def base():
            return load_table(spark, SF_DIR, "documents").select("doc_id").withColumn(
                "url",
                F.expr(
                    "concat('https://www.d', pmod(hash(doc_id), 500), '.example.com/p/',"
                    " pmod(doc_id, 4500), '?utm_source=bench&id=', pmod(doc_id, 4500))"
                ),
            )
        stages["0_base_scan"] = lambda: base()
        stages["1_badword"] = lambda: U.url_badword_filter(base(), ("casino", "poker"), max_score=0)
        stages["2_parse"] = lambda: U.parse_urls(U.url_badword_filter(base(), ("casino", "poker"), max_score=0))

        def upto_blocklist():
            gated = U.url_badword_filter(base(), ("casino", "poker"), max_score=0)
            parsed = U.parse_urls(gated)
            return U.domain_blocklist_filter(
                parsed, [f"d{i}.example.com" for i in range(50)],
                host_col="host", domain_col="domain")
        stages["3_blocklist"] = upto_blocklist
        stages["4_dedup"] = lambda: U.url_dedup(
            upto_blocklist().localCheckpoint(eager=False), norm_col="url_norm")
        stages["5_full"] = lambda: bench.bench_urls(spark, SF_DIR)
    elif which == "curate_max":
        import bench
        from pyspark.sql import functions as F

        from pg2kinesis_spark.functions.curate import curate_corpus

        def docs():
            return bench._docs_parallel(spark, SF_DIR, cols=("doc_id", "text"))

        def eval_df(d):
            return d.limit(20).select(
                F.col("doc_id").alias("eval_id"),
                F.expr("concat_ws(' ', slice(split(text, ' '), 3, 18))").alias("text"),
            )
        stages["1_quality_only"] = lambda: curate_corpus(docs(), min_quality=0.2, near_dup_jaccard=None)
        stages["2_plus_gopher"] = lambda: curate_corpus(docs(), min_quality=0.2, gopher=True, near_dup_jaccard=None)
        stages["3_plus_pii"] = lambda: curate_corpus(docs(), min_quality=0.2, gopher=True, max_pii=0, near_dup_jaccard=None)
        stages["4_plus_lsh"] = lambda: curate_corpus(docs(), min_quality=0.2, gopher=True, max_pii=0, near_dup_jaccard=0.6)
        stages["5_plus_substr"] = lambda: curate_corpus(docs(), min_quality=0.2, gopher=True, max_pii=0, near_dup_jaccard=0.6, substring_k=20)
        stages["6_full"] = lambda: bench.bench_curate_max(spark, SF_DIR)
    elif which == "dsir":
        import bench
        stages["full"] = lambda: bench.bench_dsir(spark, SF_DIR)
    elif which == "bm25":
        import bench
        stages["full"] = lambda: bench.bench_bm25(spark, SF_DIR)
    elif which == "lm":
        import bench
        stages["full"] = lambda: bench.bench_lm(spark, SF_DIR)
    else:
        raise SystemExit(f"unknown: {which}")

    for name, build in stages.items():
        spark.sparkContext.setJobDescription(f"profile:{which}:{name}")
        # warm pass
        _noop(build())
        best = min(_noop(build()) for _ in range(reps))
        print(f"{name}: {best:.3f}s")
    print(f"probe_after={_probe()}")


if __name__ == "__main__":
    main()
