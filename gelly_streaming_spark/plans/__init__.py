from gelly_streaming_spark.plans.bipartiteness import BipartitenessCheck  # noqa: F401
from gelly_streaming_spark.plans.connected_components import (  # noqa: F401
    ConnectedComponents,
)
from gelly_streaming_spark.plans.degree_check import DegreeCheck  # noqa: F401
from gelly_streaming_spark.plans.spanner import Spanner  # noqa: F401
