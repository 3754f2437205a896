"""data_engineering_project_capstone_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing capabilities of
the reference capstone ETL project (`/root/reference`, a pandas + Redshift
star-schema pipeline) as an idiomatic Spark engine:

- ``session``    — SparkSession factory tuned for local test + cluster scale.
- ``schemas``    — explicit StructTypes for every staging/star/testdata table.
- ``sources``    — declarative readers/writers (CSV, Parquet, JSON, SAS-gated).
- ``operators``  — the transformation library (capstone prep pipeline, star
                   schema builder, dedup, similarity, text analysis,
                   multimodal plumbing).
- ``functions``  — scalar column helpers (coordinate formatting, SAS dates...).
- ``plans``      — flagship analytic queries + the oracle-paired catalog.
- ``streaming``  — Structured Streaming surface over the events table.

Everything is DataFrame/Spark-SQL-first: logical plans go to Catalyst, joins
broadcast small dimensions, aggregations combine map-side, and Python stays
out of the hot path (no row-at-a-time UDFs; Arrow-batched pandas UDFs only
where built-ins cannot express the semantics).
"""

__version__ = "0.1.0"
