from ssb_coefficient_maker_spark.sources.loaders import TABLES, load_table, register_views

__all__ = ["TABLES", "load_table", "register_views"]
