from .tables import get_spark, load_table, load_tables  # noqa: F401
from .synthetic import source_code_df  # noqa: F401
