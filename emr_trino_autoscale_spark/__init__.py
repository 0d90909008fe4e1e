"""PySpark-native analytics engine re-expressing the query and
data-processing capabilities of ``aws-samples/emr-trino-autoscale``
(reference snapshot read-only at ``/root/reference``; blueprint in
``SURVEY.md``).

The reference is a metrics-driven scaling control loop; everything it
computes is re-expressed here as declarative DataFrame / SQL plans over
five canonical tables (SURVEY.md §1.3), plus a training-data extension
surface (dedup, similarity search, text analysis, multimodal columns)
designed for 100 TB-scale Spark clusters.

Layout:
    session     SparkSession factory tuned for the engine
    io          canonical table readers for the driver synthetics
    functions   scalar Column helpers (SURVEY §2.8 F1-F11)
    operators   DataFrame->DataFrame transforms (SURVEY §2.1-2.10)
    queries     the declared t2 contract: Spark builder + DuckDB oracle
                SQL per query (SURVEY §2.11)
    streaming   Structured Streaming twins of the stateful operators
    sources     collectors / snapshot schemas for the live loop
"""

__version__ = "0.1.0"
