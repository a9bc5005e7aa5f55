from usearch_spark.functions.text import (  # noqa: F401
    TOKEN_SPLIT_RE,
    tokenize,
    normalize_text,
    html_to_text,
    extract_title,
)
