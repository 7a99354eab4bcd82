from mistral_ocr_pipeline_spark.streaming.incremental import (  # noqa: F401
    run_incremental_extraction,
)
