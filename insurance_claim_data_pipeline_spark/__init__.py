"""PySpark-native analytics engine with the query & data-processing
capabilities of the reference claim pipeline
(Nickodhiambo/Insurance-Claim-Data-Pipeline), re-expressed Spark-first,
plus the large-scale extension surface (relational operator library,
LLM-data-pipeline operators, event-time windows, streaming).

Layout
------
- ``session``    : SparkSession factory tuned for local[N] testing and
                   cluster-scale defaults (AQE, UTC, Arrow).
- ``schemas``    : canonical claim schema + synthetic-table schemas.
- ``sources``    : file loaders (CSV "alpha", JSON "beta", parquet star
                   schema), source router, multimodal binary plumbing.
- ``functions``  : column-expression libraries (cleaning, classification,
                   text analysis, vector math). No row-at-a-time UDFs on
                   hot paths — everything stays JVM-side where possible.
- ``operators``  : query catalog — relational ops, dedup family,
                   similarity search, event-time windows.
- ``plans``      : end-to-end pipelines (the claim resubmission pipeline).
- ``streaming``  : Structured Streaming variants of the event queries.
- ``registry``   : the single queries()/oracle_sql() registry consumed by
                   ``__spark_entry__.py`` and the test suite.
"""

__version__ = "0.1.0"
