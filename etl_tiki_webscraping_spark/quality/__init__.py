from etl_tiki_webscraping_spark.quality.gates import (
    pair_quality,
    pair_quality_summary,
    topk_recall,
    topk_recall_summary,
)

__all__ = [
    "pair_quality",
    "pair_quality_summary",
    "topk_recall",
    "topk_recall_summary",
]
