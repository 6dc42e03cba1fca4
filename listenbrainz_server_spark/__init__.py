"""listenbrainz_server_spark — a PySpark-native analytics engine.

A ground-up, Spark-first re-implementation of the query and
data-processing capabilities of the metabrainz/listenbrainz-server
analytics engine (reference surveyed in SURVEY.md), plus the
large-scale training-data-pipeline operators (dedup, similarity
search, text analysis, multimodal columns) its architecture implies.

Everything is declared through the DataFrame / Spark SQL API so
Catalyst owns optimization (predicate pushdown, column pruning,
join strategy, AQE); Python UDFs are avoided in the hot path
(the reference engine itself has zero Python UDFs — see
listenbrainz_spark analytics code, SURVEY.md §2.11).
"""

from listenbrainz_server_spark.session import get_session, stop_session

__all__ = ["get_session", "stop_session"]
__version__ = "0.1.0"
