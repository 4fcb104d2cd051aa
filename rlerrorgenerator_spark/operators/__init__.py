"""Error-injection operators (SURVEY.md §2.A) + the mess_data driver.

Each transform is a pure function
``(df, lineage, n_errors, col_names, *, seed, stage, **kwargs)
  → (df', new_lineage_rows)``
mirroring the reference's dispatch contract (`/root/reference/R/1_error.R:62-106`)
but returning the lineage explicitly (Spark has no attributes-on-DataFrames).
"""

from rlerrorgenerator_spark.operators.base import (
    LINEAGE_SCHEMA,
    REGISTRY,
    empty_lineage,
    register,
)
from rlerrorgenerator_spark.operators import (  # noqa: F401  (registration side effects)
    dates,
    edit,
    field,
    lookup,
    rows,
)
from rlerrorgenerator_spark.operators.driver import ErrorConfigRow, calibrate_error_rate, mess_data

__all__ = [
    "LINEAGE_SCHEMA",
    "REGISTRY",
    "register",
    "empty_lineage",
    "mess_data",
    "calibrate_error_rate",
    "ErrorConfigRow",
]
