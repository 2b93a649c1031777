from baker_spark.sources.tables import load_table, load_tables, register_views  # noqa: F401
from baker_spark.sources.list_source import ListSource  # noqa: F401
