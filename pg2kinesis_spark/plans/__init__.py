from pg2kinesis_spark.plans.queries import QUERIES  # noqa: F401
from pg2kinesis_spark.plans.oracle import ORACLE_SQL  # noqa: F401
