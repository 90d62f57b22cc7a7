"""End-to-end Sendo-shaped pipeline on deterministic mock fetchers:
FK enforcement, load ordering, idempotency across runs, upsert-refresh
on changed payloads (SURVEY.md §2.12 O1-O5)."""

from __future__ import annotations

from decimal import Decimal

import pytest

from etl_tiki_webscraping_spark.plans.pipeline import (
    PipelineFetchers,
    run_pipeline,
    warehouse_table,
)
from etl_tiki_webscraping_spark.sources.http import FetchConfig

FAST = FetchConfig(max_retries=0, backoff_seconds=0.0)

SITEMAP = [
    {"url_key": "electronics", "child": [{"url_key": "phones"}, {"url_key": "laptops"}]},
    {"url_key": "fashion", "child": [{"url_key": "shoes"}]},
]

def fetchers(version="v1"):
    """Deterministic fakes, defined as CLOSURES so cloudpickle ships
    them by value (a test module isn't importable on executors).

    2 pages of 2 products per sub-category; shop ids collide across
    sub-categories so dedup-by-shop matters.  One product points at a
    shop whose detail lookup FAILS (returns None) -> FK drop."""
    shop_of = {"phones": 0, "laptops": 1, "shoes": 0}

    def product_page(row, page, cfg):
        if page > 2:
            return None
        sc = row["sub_category"]
        out = []
        for j in range(2):
            pid = f"p-{sc}-{page}-{j}"
            shop = "shop-unknown" if pid == "p-shoes-1-0" else f"shop-{shop_of[sc]}"
            out.append(
                {
                    "product_id": pid,
                    "name": f"{version}-{pid}",
                    "category_path": f"{sc}/{pid}.html",
                    "price": Decimal("10.00"),
                    "price_max": Decimal("20.00"),
                    "final_price": Decimal("9.00"),
                    "final_price_max": Decimal("18.00"),
                    "shop_id": shop,
                }
            )
        return out

    def shop_detail(row, cfg):
        if row["shop_id"] == "shop-unknown":
            return None  # lookup fails -> shop never lands -> FK must drop its product
        return {
            "shop_id": row["shop_id"],
            "shop_name": f"Shop {row['shop_id']}",
            "good_review_percent": Decimal("99.10"),
            "score": Decimal("4.50"),
            "customer_id": "c1",
            "phone_number": "555",
            "rating_avg": Decimal("4.40"),
            "rating_count": 10,
            "response_time": "fast",
            "product_total": 4,
            "sale_on_sendo": "5 years",
            "time_prepare_product": "1 day",
            "warehourse_region_name": "north",
        }

    def rating_page(row, page, cfg):
        if page > 1:
            return None
        return [
            {
                "rating_id": f"r-{row['shop_id']}-{i}",
                "shop_id": row["shop_id"],
                "address": "x",
                "star": 4 + (i % 2),
                "comment": "ok",
                "status": "approved",
                "update_time": "05/03/2024" if i == 0 else "bad-date",
                "customer_id": f"c{i}",
                "user_name": f"u{i}",
                "product_name": "p",
                "product_path": "p.html",
                "price": Decimal("10.00"),
            }
            for i in range(2)
        ]

    sitemap = list(SITEMAP)
    return PipelineFetchers(
        sitemap=lambda: sitemap,
        product_page=product_page,
        shop_detail=shop_detail,
        rating_page=rating_page,
    )


@pytest.fixture()
def warehouse(tmp_path):
    return str(tmp_path / "wh")


def _table_rows(spark, warehouse, name):
    return sorted(map(tuple, warehouse_table(spark, warehouse, name).collect()))


def test_pipeline_end_to_end(spark, warehouse):
    res = run_pipeline(spark, fetchers(), warehouse, FAST)
    # 3 sub-categories x 2 pages x 2 products = 12 scraped; 1 dropped by FK
    assert res.products == 11
    assert res.products_dropped_by_fk == 1
    # shop-0 and shop-1 land; the failed shop-unknown lookup does not
    assert res.shops == 2
    assert res.ratings == 4

    # FK invariant: every product/rating shop_id exists in shop_info
    shops = {r["shop_id"] for r in warehouse_table(spark, warehouse, "shop_info").collect()}
    assert {r["shop_id"] for r in warehouse_table(spark, warehouse, "product_detail").collect()} <= shops

    # date parse: valid dd/MM/yyyy parsed, malformed -> null
    ratings = warehouse_table(spark, warehouse, "rating").collect()
    parsed = {r["rating_id"]: r["update_time"] for r in ratings}
    assert any(v is not None for v in parsed.values())
    assert any(v is None for v in parsed.values())


def test_pipeline_is_idempotent(spark, warehouse):
    run_pipeline(spark, fetchers(), warehouse, FAST)
    first = {n: _table_rows(spark, warehouse, n) for n in ("shop_info", "product_detail", "rating")}
    run_pipeline(spark, fetchers(), warehouse, FAST)
    second = {n: _table_rows(spark, warehouse, n) for n in ("shop_info", "product_detail", "rating")}
    assert first == second


def test_pipeline_upsert_refreshes_changed_rows(spark, warehouse):
    run_pipeline(spark, fetchers("v1"), warehouse, FAST)
    res = run_pipeline(spark, fetchers("v2"), warehouse, FAST)
    assert res.products == 11  # same key space, no growth
    names = [r["name"] for r in warehouse_table(spark, warehouse, "product_detail").collect()]
    assert all(n.startswith("v2-") for n in names)  # every non-key col refreshed
