"""DuckDB oracle SQL for every query in ``plans/queries.py``.

Column aliases must match the Spark side exactly — the harness sorts
columns by name before hashing values.
"""

from __future__ import annotations

ORACLE_SQL: dict[str, str] = {
    "q1_leftjoin_concat": """
        SELECT n.n_name || '.' || r.r_name AS qn, r.r_name AS r_name
        FROM nation n LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
        ORDER BY qn
    """,
    "q2_join_chain": """
        SELECT c.c_custkey, o.o_orderkey
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE l.l_linenumber = 1
        ORDER BY 1, 2 LIMIT 1000
    """,
    "q3_scalar_regex": """
        SELECT p_partkey, p_name,
               regexp_extract(p_type, '([A-Z]+)', 1) AS type_head,
               ROUND(p_retailprice * CAST(1.1 AS DOUBLE), 2) AS bumped,
               UPPER(p_brand) AS brand_u,
               LENGTH(p_name) AS name_len
        FROM part
        WHERE regexp_matches(p_name, '[aeiou]{2}')
        ORDER BY p_partkey
    """,
    "q5_csv_in_filter": """
        SELECT o_orderkey, o_orderstatus,
               concat_ws(',', '0', 'CDC', CAST(o_orderkey AS VARCHAR), o_orderstatus) AS fmt_msg
        FROM orders
        WHERE o_orderstatus IN ('O', 'F') ORDER BY o_orderkey
    """,
    "q7_json_extract": """
        SELECT event_id, json_extract_string(props, '$.k') AS k
        FROM events ORDER BY event_id
    """,
    "q8_explode_split": """
        SELECT doc_id, w
        FROM documents, UNNEST(string_split(text, ' ')) AS t(w)
        WHERE doc_id < 100
        ORDER BY doc_id, w
    """,
    "q9_maxby_lastwins": """
        SELECT l_orderkey, MAX_BY(l_partkey, l_linenumber * 10000000 + l_partkey) AS last_partkey
        FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey
    """,
    "q10_semi_anti_join": """
        SELECT 'semi' AS tag, c_custkey FROM customer
        WHERE c_custkey IN (SELECT o_custkey FROM orders)
        UNION ALL
        SELECT 'anti' AS tag, c_custkey FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        ORDER BY tag, c_custkey
    """,
    "q12_range_join": """
        SELECT s.s_suppkey, c.c_custkey
        FROM supplier s JOIN customer c
          ON c.c_acctbal BETWEEN s.s_acctbal - 10 AND s.s_acctbal
        ORDER BY 1, 2 LIMIT 1000
    """,
    "q13_hash_agg": """
        SELECT l_returnflag, l_linestatus,
               SUM(l_quantity) AS sum_qty,
               AVG(l_extendedprice) AS avg_price,
               COUNT(*) AS cnt
        FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "q15_rollup_cube": """
        SELECT 'rollup' AS tag, n_regionkey, n_nationkey, COUNT(*) AS cnt
        FROM nation GROUP BY ROLLUP (n_regionkey, n_nationkey)
        UNION ALL
        SELECT 'cube' AS tag, n_regionkey, n_nationkey, COUNT(*) AS cnt
        FROM nation GROUP BY CUBE (n_regionkey, n_nationkey)
        UNION ALL
        SELECT 'sets' AS tag, n_regionkey, n_nationkey, COUNT(*) AS cnt
        FROM nation GROUP BY GROUPING SETS ((n_regionkey), (n_nationkey), ())
        ORDER BY tag, 2 NULLS FIRST, 3 NULLS FIRST
    """,
    # q17 absorbs the former q19_topk (round-4 registry consolidation):
    # window ranking + global top-k, tagged.
    "q17_rank_window": """
        SELECT 'rank' AS op, o_custkey, o_orderkey, CAST(rn AS DOUBLE) AS val
        FROM (
          SELECT o_custkey, o_orderkey,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
          FROM orders ORDER BY o_custkey, rn LIMIT 1000
        )
        UNION ALL
        SELECT 'topk' AS op, CAST(NULL AS BIGINT) AS o_custkey, o_orderkey, o_totalprice AS val
        FROM (
          SELECT o_orderkey, o_totalprice FROM orders
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
        )
    """,
    "q18_carry_forward": """
        SELECT event_id,
               LAST_VALUE(CASE WHEN event_type = 'signup' THEN user_id END IGNORE NULLS)
                 OVER (ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS last_signup_user
        FROM events ORDER BY event_id LIMIT 1000
    """,
    "q20_set_ops": """
        SELECT 'union' AS op, n_nationkey FROM (
          SELECT n_nationkey FROM nation WHERE n_regionkey = 0
          UNION
          SELECT n_nationkey FROM nation WHERE n_nationkey < 5
        )
        UNION ALL
        SELECT 'intersect' AS op, n_nationkey FROM (
          SELECT n_nationkey FROM nation WHERE n_regionkey = 0
          INTERSECT
          SELECT n_nationkey FROM nation WHERE n_nationkey < 5
        )
        UNION ALL
        SELECT 'except' AS op, n_nationkey FROM (
          SELECT n_nationkey FROM nation WHERE n_regionkey = 0
          EXCEPT
          SELECT n_nationkey FROM nation WHERE n_nationkey < 5
        )
        ORDER BY op, n_nationkey
    """,
    # q21 also carries the former q30 rows (round-11 consolidation):
    # each engine runs its OWN HLL sketch and witnesses the same ±5%
    # tolerance against the exact count — hash-checkable even though
    # the raw estimates differ; quantile_cont ≡ Spark percentile().
    "q21_date_trunc": """
        SELECT 'month' AS tag,
               CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS bucket,
               COUNT(*) AS cnt,
               CAST(COUNT(DISTINCT o_custkey) AS DOUBLE) AS val
        FROM orders GROUP BY 2
        UNION ALL
        SELECT 'hour' AS tag,
               time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS bucket,
               COUNT(*) AS cnt, SUM(value) AS val
        FROM events GROUP BY 2
        UNION ALL
        SELECT t.tag, CAST(NULL AS TIMESTAMP) AS bucket,
               s.exact_custs AS cnt,
               CASE t.tag
                 WHEN 'hll' THEN s.hll_ok
                 WHEN 'p25' THEN s.p25
                 WHEN 'p50' THEN s.p50
                 ELSE s.p75
               END AS val
        FROM (
          SELECT count(DISTINCT o_custkey) AS exact_custs,
                 CAST(abs(approx_count_distinct(o_custkey)
                          - count(DISTINCT o_custkey))
                      / CAST(count(DISTINCT o_custkey) AS DOUBLE) <= 0.05
                      AS DOUBLE) AS hll_ok,
                 quantile_cont(o_totalprice, 0.25) AS p25,
                 quantile_cont(o_totalprice, 0.5) AS p50,
                 quantile_cont(o_totalprice, 0.75) AS p75
          FROM orders
        ) s, (VALUES ('hll'), ('p25'), ('p50'), ('p75')) AS t(tag)
        ORDER BY tag, bucket
    """,
    "q23_array_aggregate": """
        SELECT vec_id,
               list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS emb_sum
        FROM embeddings ORDER BY vec_id LIMIT 1000
    """,
}
