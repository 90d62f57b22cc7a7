from etl_tiki_webscraping_spark.sources.http import (
    FetchConfig,
    paginated_source,
    keyed_lookup_source,
)
from etl_tiki_webscraping_spark.sources.records import (
    records_to_df,
    json_records_to_df,
    sitemap_to_pairs,
)

__all__ = [
    "FetchConfig",
    "paginated_source",
    "keyed_lookup_source",
    "records_to_df",
    "json_records_to_df",
    "sitemap_to_pairs",
]
