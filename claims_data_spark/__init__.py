"""claims_data_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of PHSKC-APDE/claims_data (R + T-SQL against SQL
Server / Azure Synapse) as idiomatic Spark DataFrame / Spark SQL
plans, plus the large-scale training-data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing)
that a 100 TB Spark deployment needs.

Layout
------
- ``session``    SparkSession factory with scale-oriented defaults
- ``schema``     declared-schema registry (YAML-shaped dict -> StructType)
- ``functions``  scalar helpers (T-SQL-compatible date math, string
                 classification, ICD normalization, text stats)
- ``operators``  reusable relational operators (interval algebra,
                 modes, episodes, rolling frames, tabulation,
                 dedup, similarity, dense ids, as-of joins)
- ``sources``    readers/writers/calendar dimension
- ``plans``      parameterized plan builders (dynamic predicates,
                 prefix joins, cohort queries)
- ``streaming``  Structured Streaming ingest with the reference's
                 replace-duplicates semantics
"""

__version__ = "0.1.0"
