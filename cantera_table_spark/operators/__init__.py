from cantera_table_spark.operators import set_algebra

__all__ = ["set_algebra"]
