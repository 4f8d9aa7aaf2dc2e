"""PySpark-native analytics/search engine (Mini-Distributed-Search-Engine capabilities, Spark-first)."""
