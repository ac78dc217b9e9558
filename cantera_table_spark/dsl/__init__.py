from cantera_table_spark.dsl.ast import (
    Leaf, KeyLookup, Binary, Unary, QueryStmt, CorrelateStmt, SelectStmt,
    ParseStmt, SetStmt, Thresholds,
)
from cantera_table_spark.dsl.parser import parse_script, parse_query

__all__ = [
    "Leaf", "KeyLookup", "Binary", "Unary", "QueryStmt", "CorrelateStmt",
    "SelectStmt", "ParseStmt", "SetStmt", "Thresholds",
    "parse_script", "parse_query",
]
