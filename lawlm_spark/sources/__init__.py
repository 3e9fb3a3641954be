from lawlm_spark.sources import mirror, rest
from lawlm_spark.sources.testdata import TABLES, load_table, load_tables, register_views

__all__ = ["TABLES", "load_table", "load_tables", "register_views", "mirror", "rest"]
