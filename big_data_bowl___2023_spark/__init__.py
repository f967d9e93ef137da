"""PySpark-native analytics engine with the query surface of
paulg66/Big-Data-Bowl---2023 (see SURVEY.md).

The reference is a single-node, eager R analysis pipeline; this package
re-expresses every operator it uses (SURVEY.md §2) as composable, lazy
PySpark DataFrame transformations so Catalyst/Tungsten/AQE pick the
physical strategy, plus the large-scale training-data-pipeline
extensions (dedup, similarity search, text analysis, multimodal
plumbing) that make the engine useful at 100 TB.

Layout:
    session     — tuned SparkSession builder (AQE, Arrow, shuffle sizing)
    catalog     — the star schema as temp views: the spark.sql entry point
    sources     — explicit schemas + readers/writers (SURVEY §2.1)
    operators   — relational core: filters/joins/aggs/windows/sorts/setops
    functions   — scalar/text/vector column expression helpers
    plans       — plan introspection (pushdown / broadcast assertions)
    pipelines   — the reference's composite queries Q1–Q10 (SURVEY §2.11)
    ml          — expected-metric model layer (SURVEY §2.10 M1–M9)
    dedup       — exact / minhash-LSH / simhash / n-gram-jaccard / embedding
    similarity  — ANN over embedding columns (brute-force + LSH-bucketed)
    multimodal  — binary-column (image/audio/video) plumbing, decode stubbed
    streaming   — Structured Streaming equivalents of the event pipelines
    registry    — the queries()/oracle_sql() registration used by
                  __spark_entry__.py (the driver correctness contract)
"""

__version__ = "0.1.0"
