"""mimranalytics-core-spark: a PySpark-native analytics engine with the query and
data-processing capabilities of mimranalytics/mimranalytics-core (corporate-ownership
graph analytics: N-tier mapping, UBO, conflict/cycle detection, Time-Slider,
audit export) plus LLM-pipeline operators (dedup, similarity search,
multimodal columns, text analysis), designed for 100 TB scale.

Entry points:

- ``mimranalytics_core_spark.api`` — the product-level surface (what a backend serves).
- ``mimranalytics_core_spark.registry`` — the full declared operator inventory
  (feeds ``__spark_entry__.py``'s ``queries()`` / ``oracle_sql()``).
- ``mimranalytics_core_spark.functions.graph_algos`` — distributed graph library
  (UBO closure, BFS/SSSP, components, PageRank, Brandes betweenness).
- ``mimranalytics_core_spark.session.get_spark`` — correctly-configured session.
"""

__version__ = "0.1.0"
