from mistral_ocr_pipeline_spark.fixtures.gen import (  # noqa: F401
    gen_transcripts,
    transcripts_schema,
)
