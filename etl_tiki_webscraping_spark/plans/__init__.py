from etl_tiki_webscraping_spark.plans.catalog import QUERIES, QuerySpec, get_queries, get_oracles

__all__ = ["QUERIES", "QuerySpec", "get_queries", "get_oracles"]
