from pg2kinesis_spark.plans.queries import QUERIES
from pg2kinesis_spark.plans.oracle import ORACLE_SQL
from pg2kinesis_spark.plans.cdc_queries import CDC_ORACLE_SQL, CDC_QUERIES
from pg2kinesis_spark.plans.ns_queries import NS_ORACLE_SQL, NS_QUERIES
from pg2kinesis_spark.plans.ext_queries import EXT_ORACLE_SQL, EXT_QUERIES
from pg2kinesis_spark.plans.r4_queries import R4_ORACLE_SQL, R4_QUERIES
from pg2kinesis_spark.plans.r6_queries import R6_ORACLE_SQL, R6_QUERIES
from pg2kinesis_spark.plans.r10_queries import R10_ORACLE_SQL, R10_QUERIES
from pg2kinesis_spark.plans.r11_queries import R11_ORACLE_SQL, R11_QUERIES

QUERIES = {**QUERIES, **CDC_QUERIES, **NS_QUERIES, **EXT_QUERIES, **R4_QUERIES, **R6_QUERIES, **R10_QUERIES, **R11_QUERIES}
ORACLE_SQL = {**ORACLE_SQL, **CDC_ORACLE_SQL, **NS_ORACLE_SQL, **EXT_ORACLE_SQL, **R4_ORACLE_SQL, **R6_ORACLE_SQL, **R10_ORACLE_SQL, **R11_ORACLE_SQL}

__all__ = ["QUERIES", "ORACLE_SQL"]
