"""lakehouse_automation_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference
system ``khkwon01/lakehouse_automation`` (a MySQL HeatWave lakehouse
ingestion-automation toolkit) on Apache Spark:

- the ingestion pipeline (synthetic generation -> file landing ->
  incremental load -> audit ledger) as Structured Streaming + batch
  jobs (reference: ``datagen.py``, ``check_lakehouse.py``),
- the full analytic-SQL surface the reference delegates to HeatWave
  (reference: ``lib/commondb.py:81-124`` passthroughs) as native
  Spark SQL / DataFrame operators,
- LLM-data-pipeline extensions (dedup, similarity search, text
  analysis, multimodal plumbing) designed for 100 TB scale.

Everything is DataFrame/SQL-first: declare the logical plan, let
Catalyst/Tungsten pick the physical strategy. Python UDFs appear only
where built-ins genuinely cannot express the semantics, and then only
as Arrow-vectorized pandas UDFs.
"""

__version__ = "0.1.0"
