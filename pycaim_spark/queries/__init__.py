"""Query modules — importing this package registers every SURVEY §2 query."""

import pycaim_spark.queries.aggregates  # noqa: F401
