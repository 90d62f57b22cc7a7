"""Warehouse schemas as explicit StructTypes — single source of truth.

Mirrors the reference's fixed at-rest DDL (`/root/reference/sql/dwh.sql`)
and the in-flight projections (`/root/reference/dags/etl.py:67-80,
98-114,148-163`).  The reference infers dtypes in flight (pandas) and
lets MySQL coerce at insert; we instead declare schemas once and apply
them at ingestion so in-flight == at-rest (SURVEY.md §1.3).

`warehourse_region_name` is the reference's own typo
(`sql/dwh.sql:14`) — kept verbatim for column-name fidelity.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- shop_info (sql/dwh.sql:1-15) -----------------------------------------
SHOP_INFO = T.StructType(
    [
        T.StructField("shop_id", T.StringType(), False),  # PRIMARY KEY (sql/dwh.sql:2)
        T.StructField("shop_name", T.StringType()),
        T.StructField("good_review_percent", T.DecimalType(10, 2)),
        T.StructField("score", T.DecimalType(10, 2)),
        T.StructField("customer_id", T.StringType()),
        T.StructField("phone_number", T.StringType()),
        T.StructField("rating_avg", T.DecimalType(10, 2)),
        T.StructField("rating_count", T.IntegerType()),
        T.StructField("response_time", T.StringType()),
        T.StructField("product_total", T.IntegerType()),
        T.StructField("sale_on_sendo", T.StringType()),
        T.StructField("time_prepare_product", T.StringType()),
        T.StructField("warehourse_region_name", T.StringType()),
    ]
)

# --- product_detail (sql/dwh.sql:17-29) -----------------------------------
PRODUCT_DETAIL = T.StructType(
    [
        T.StructField("product_id", T.StringType(), False),  # PRIMARY KEY (sql/dwh.sql:18)
        T.StructField("name", T.StringType()),
        T.StructField("category_path", T.StringType()),
        T.StructField("price", T.DecimalType(15, 2)),
        T.StructField("price_max", T.DecimalType(15, 2)),
        T.StructField("final_price", T.DecimalType(15, 2)),
        T.StructField("final_price_max", T.DecimalType(15, 2)),
        T.StructField("shop_id", T.StringType()),  # FK -> shop_info.shop_id (sql/dwh.sql:28)
        T.StructField("category", T.StringType()),
        T.StructField("sub_category", T.StringType()),
    ]
)

# --- rating (sql/dwh.sql:31-45) -------------------------------------------
RATING = T.StructType(
    [
        T.StructField("rating_id", T.StringType(), False),  # PRIMARY KEY (sql/dwh.sql:32)
        T.StructField("shop_id", T.StringType()),  # FK -> shop_info.shop_id (sql/dwh.sql:44)
        T.StructField("address", T.StringType()),
        T.StructField("star", T.IntegerType()),
        T.StructField("comment", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("update_time", T.DateType()),  # parsed from dd/MM/yyyy (dags/etl.py:164-166)
        T.StructField("customer_id", T.StringType()),
        T.StructField("user_name", T.StringType()),
        T.StructField("product_name", T.StringType()),
        T.StructField("product_path", T.StringType()),
        T.StructField("price", T.DecimalType(15, 2)),
    ]
)

# Primary keys driving upsert semantics (dags/etl.py:187,228,266).
PRIMARY_KEYS = {
    "shop_info": ["shop_id"],
    "product_detail": ["product_id"],
    "rating": ["rating_id"],
}

# FK graph driving load ordering (sql/dwh.sql:28,44; dags/etl.py:218-251).
FOREIGN_KEYS = {
    "product_detail": [("shop_id", "shop_info", "shop_id")],
    "rating": [("shop_id", "shop_info", "shop_id")],
}

# --- in-flight sitemap shape (dags/etl.py:31-39) --------------------------
# result.data[] = {url_key, child: [{url_key, ...}]}
SITEMAP_CATEGORY = T.StructType(
    [
        T.StructField("url_key", T.StringType()),
        T.StructField(
            "child",
            T.ArrayType(T.StructType([T.StructField("url_key", T.StringType())])),
        ),
    ]
)

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
