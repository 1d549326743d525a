from streamprocessing_kafka_finlight_news_dashboard_spark.plans.catalog import (
    CATALOG,
    CatalogQuery,
    all_queries,
    oracle_map,
    query,
)

# Importing the plan modules populates the catalog registry.
from streamprocessing_kafka_finlight_news_dashboard_spark.plans import (  # noqa: E402,F401
    relational,
    relational2,
    relational3,
    timeseries,
    text,
    similarity,
    multimodal,
    domain,
)

__all__ = ["CATALOG", "CatalogQuery", "all_queries", "oracle_map", "query"]
