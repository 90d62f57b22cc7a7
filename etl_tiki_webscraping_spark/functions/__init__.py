from etl_tiki_webscraping_spark.functions.scalar import (
    strip_html_suffix,
    parse_day_first_date,
    build_url,
)
from etl_tiki_webscraping_spark.functions.text import (
    tokenize_ws,
    token_count,
    quality_features,
    language_id,
    doc_fingerprint,
)

__all__ = [
    "strip_html_suffix",
    "parse_day_first_date",
    "build_url",
    "tokenize_ws",
    "token_count",
    "quality_features",
    "language_id",
    "doc_fingerprint",
]
