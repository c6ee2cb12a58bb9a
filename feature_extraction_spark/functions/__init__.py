from feature_extraction_spark.functions.text import (  # noqa: F401
    nan,
    nan_guard_div,
    syllable_count_expr,
    tokenize_expr,
)
