"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference repo
``Pratham-Jain-3903/streamprocessing-kafka-finlight-news-dashboard``
("Project Mercury" — a pandas news-sentiment trading platform), rebuilt
Spark-first: DataFrame/SQL plans optimized by Catalyst, Pandas UDFs only
where relational ops can't express the semantics, Structured Streaming
for the ingest plane.

Nothing here is a port: the reference's eager single-process pandas
operators (see SURVEY.md §2) are re-expressed as lazy, distributed,
shuffle-aware DataFrame transforms designed for 100 TB / 1000-executor
scale and merely *tested* on local[32].
"""

from streamprocessing_kafka_finlight_news_dashboard_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
