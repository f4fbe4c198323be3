"""PySpark-native analytics engine with the query and data-processing
capabilities of jacob1421/RustCheatersDataPipeline.

The reference is an Airflow + pandas + Postgres star-schema ETL pipeline
(see SURVEY.md). This engine re-expresses every operator it implements as
idiomatic PySpark DataFrame/SQL over Catalyst:

- ``session``    — SparkSession factory (UTC, AQE, Arrow).
- ``catalog``    — test-table registration (TPC-H-ish synthetic data).
- ``operators``  — the row-level / dedup / upsert operator library
                   (SURVEY.md §2.2, §2.3, §2.5).
- ``functions``  — text analysis + similarity primitives for the
                   training-data extensions (dedup, ANN, lang-id, ...).
- ``plans``      — declared queries (SURVEY.md §2.9 Q1-Q30) and the
                   training-data query suite, each paired with a DuckDB
                   oracle SQL string.
- ``sources``    — rate-limited HTTP source + schema-pinned file readers
                   (SURVEY.md §2.1).
- ``transforms`` — the 16 dim/fact silver builders (SURVEY.md §3.2).
- ``warehouse``  — surrogate keys, date dim, anti-join append and
                   latest-wins upsert writers (SURVEY.md §2.4-§2.5).
- ``streaming``  — Structured Streaming equivalents (SURVEY.md §2.7).
"""

__version__ = "0.1.0"
