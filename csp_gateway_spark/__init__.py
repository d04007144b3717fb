"""csp_gateway_spark — a PySpark-native analytics engine with the
capabilities of Point72/csp-gateway (reference: /root/reference).

Architecture (SURVEY.md §7): a ChannelCatalog of named typed streams,
keyed-last state materialization, a Filter/Query → Column compiler,
pluggable source/sink modules, a Perspective-style pivot/aggregate view
layer, and large-scale data-pipeline operators (dedup, similarity
search, text analysis) — all expressed with the Spark DataFrame/SQL
API so Catalyst/Tungsten/AQE pick the physical plan.
"""

from csp_gateway_spark.session import get_spark
from csp_gateway_spark.query import Filter, Query, compile_filter, compile_query
from csp_gateway_spark.catalog import ChannelCatalog, Gateway, GatewayModule

__version__ = "0.1.0"

__all__ = [
    "get_spark",
    "Filter",
    "Query",
    "compile_filter",
    "compile_query",
    "ChannelCatalog",
    "Gateway",
    "GatewayModule",
]
