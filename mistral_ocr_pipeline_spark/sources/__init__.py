from mistral_ocr_pipeline_spark.sources.catalog import TableCatalog  # noqa: F401
