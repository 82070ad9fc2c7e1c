"""Query modules — importing this package registers every SURVEY §2 query."""

import pycaim_spark.queries.advanced  # noqa: F401
import pycaim_spark.queries.aggregates  # noqa: F401
import pycaim_spark.queries.caim_queries  # noqa: F401
import pycaim_spark.queries.functions  # noqa: F401
import pycaim_spark.queries.joins  # noqa: F401
import pycaim_spark.queries.llm_dedup  # noqa: F401
import pycaim_spark.queries.llm_text  # noqa: F401
import pycaim_spark.queries.misc_ops  # noqa: F401
import pycaim_spark.queries.pipeline_ops  # noqa: F401
import pycaim_spark.queries.pipeline_patterns  # noqa: F401
import pycaim_spark.queries.relational  # noqa: F401
import pycaim_spark.queries.scale_patterns  # noqa: F401
import pycaim_spark.queries.sketches  # noqa: F401
import pycaim_spark.queries.storage  # noqa: F401
import pycaim_spark.queries.tpch_full  # noqa: F401
import pycaim_spark.queries.tpch_more  # noqa: F401
import pycaim_spark.queries.streaming_queries  # noqa: F401
import pycaim_spark.queries.udfs  # noqa: F401
import pycaim_spark.queries.windows  # noqa: F401
