"""npm_search_spark — a from-scratch PySpark-native re-creation of the
capabilities of algolia/npm-search (reference at /root/reference, read-only).

A URL-frontier + fetch scheduler with per-document transform pipeline,
per-host politeness, partitioned-Bloom URL dedup, priority ordering and
checkpointed resume — expressed as DataFrame / Structured-Streaming jobs
over snapshot-versioned parquet tables of interleaved text+media documents.

Layout:
  session      SparkSession factory (AQE, Arrow, shuffle tuning)
  schema       all StructTypes (documents, raw_packages, frontier, dims...)
  tables       minimal snapshot table format (Iceberg-style semantics on parquet)
  format_pkg   Arrow-vectorized formatPkg equivalent (reference src/formatPkg.ts)
  functions/   column-expression library (urls, text, spans)
  enrich       broadcast-join enrichment stages (reference src/saveDocs.ts)
  seen         partitioned Bloom + exact anti-join URL-seen set
  frontier     politeness/priority scheduler + bootstrap generation loop
  state        checkpoint + resume (reference src/StateManager.ts)
  streaming/   watch-mode incremental crawl (reference src/watch.ts)
  pipeline/    training-data ops: dedup, similarity, text stats, multimodal
"""

__version__ = "0.1.0"
