from etl_tiki_webscraping_spark.operators.relational import (
    anti_join,
    dedup_first,
    dedup_deterministic,
    distinct_keys,
    fk_semi_join,
    key_space_union,
    repartition_even,
    union_all,
    top_k_per_group,
)

__all__ = [
    "anti_join",
    "dedup_first",
    "dedup_deterministic",
    "distinct_keys",
    "fk_semi_join",
    "key_space_union",
    "repartition_even",
    "union_all",
    "top_k_per_group",
]
