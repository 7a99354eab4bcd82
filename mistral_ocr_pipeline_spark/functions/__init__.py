from mistral_ocr_pipeline_spark.functions.text_functions import (  # noqa: F401
    is_numeric_string_col,
    norm_key_col,
    normalize_plain_col,
    references_heading_col,
    sha256_provenance,
    strip_trailing_dot_zero,
)
