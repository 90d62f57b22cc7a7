"""PySpark-native analytics engine with the query/data-processing
capabilities of doansilinh/etl-tiki-webscraping.

The reference (/root/reference, studied in SURVEY.md) is an Airflow +
pandas + MySQL scraping ETL.  This package re-expresses its data model,
operators, merge/upsert semantics and pipeline structure as idiomatic
PySpark DataFrame programs, and extends the surface with the
large-scale training-data-pipeline operators (dedup, similarity search,
multimodal columns, text analysis) described in BASELINE.json.

Nothing here is a translation of reference code: the reference tells us
WHAT to compute (see citations in each module's docstrings); the HOW is
DataFrame/SQL plans optimized by Catalyst.
"""

from etl_tiki_webscraping_spark.session import get_spark, stop_spark

__all__ = ["get_spark", "stop_spark"]

__version__ = "0.1.0"
