from streamprocessing_kafka_finlight_news_dashboard_spark.functions.sentiment import (
    sentiment_udf,
)
from streamprocessing_kafka_finlight_news_dashboard_spark.functions.stats import (
    pearson_p_value,
)

__all__ = ["sentiment_udf", "pearson_p_value"]
