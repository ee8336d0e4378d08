"""PySpark-native analytics engine with the query/data-processing
capabilities of aws-samples/news-clustering-and-summarization.

Built from scratch on the public PySpark API (DataFrame / SQL /
Structured Streaming). The reference system (read-only snapshot at
/root/reference) is an event-driven streaming ETL + ML pipeline:
ingest -> preprocess -> embed -> incremental-DBSCAN clustering ->
cluster tables -> threshold-triggered summarization -> serving query.
This package re-expresses each stage as composable, independently
queryable Spark operators (see SURVEY.md for the file:line parity map).

Layout:
  schemas          -- StructTypes for the article/cluster table kinds
  session          -- SparkSession builder tuned for local[N] testing
  functions.text   -- scalar text ops (clean/strip/entity-extract/...)
  functions.hashing-- deterministic md5-based token/shingle hashing
  functions.vectors-- embedding column math (dot/norm/cosine)
  sources          -- ingest decoding (base64+JSON), file readers
  operators        -- preprocess, embed, cluster, cluster_tables,
                      summarize, serving, dedup, similarity,
                      text_analysis, multimodal
  streaming        -- structured-streaming assembly + count trigger
"""

__version__ = "0.1.0"
