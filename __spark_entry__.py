"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Implementations live in ``cantera_table_spark.gate``; each entry pairs a
Spark implementation (through the engine DSL wherever the reference had
an equivalent operator) with its DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from cantera_table_spark import gate


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: full DSL pipeline —
    (spark AND fast OR slow) re-scored by document length, top-20 page."""
    from cantera_table_spark.gate import _dsl
    return _dsl(spark, "/root/testdata/sf0.001",
                "QUERY (spark AND fast OR slow ORDER BY len:chars) "
                "LIMIT 20;")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return gate.queries()


def oracle_sql() -> dict[str, str]:
    return gate.oracle_sql()
