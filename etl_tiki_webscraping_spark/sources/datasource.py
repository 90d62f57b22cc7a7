"""Custom PySpark DataSource for paginated/keyed HTTP scans
(SURVEY.md §2.1 S1-S4 "at scale" path).

``sources/http.py`` builds the same scans over ``mapInPandas`` from a
keys DataFrame; this module is the Spark-4-native form — a registered
``DataSource`` whose *planner-visible* unit of parallelism is the key:

    spark.dataSource.register(PaginatedHttpDataSource)
    df = (spark.read.format("paginated_http")
          .schema("item_id bigint, shop_id string")
          .option("keys", json.dumps([{"shop_id": "s1"}, ...]))
          .option("fetcher", "pkg.module:fetch_page")
          .load())

One ``InputPartition`` per key: Spark schedules keys across executors
like file splits, task retries re-fetch only that key
(the reference's Airflow task-retry analog, dags/etl.py:288-289), and
pagination-until-empty runs inside the partition read
(dags/etl.py:58-59,140-141).  The fetcher is referenced by dotted path
("module:function") so the descriptor survives pickling to executors
without shipping closures; tests point it at a deterministic module-
level fake.

The reference's 5-way static split (dags/etl.py:115-120) disappears:
every key is a partition, so the tail-loss bug is structurally
impossible and parallelism is the scheduler's decision, not a
hand-tuned constant.
"""

from __future__ import annotations

import importlib
import json
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


def resolve_fetcher(ref: str):
    """'package.module:function' -> callable (resolved on the executor)."""
    mod_name, _, fn_name = ref.partition(":")
    return getattr(importlib.import_module(mod_name), fn_name)


def synthetic_fetch_page(key: dict, page: int, page_size: int = 4) -> list[dict] | None:
    """Deterministic fake fetcher (module-level so executors can import
    it by dotted path): key {'k': n} yields items 0..(3n+4) across
    pages of ``page_size``.  Mirrors the oracle arithmetic used by the
    catalog's paginated-source checks."""
    total = int(key["k"]) * 3 + 5
    start = (page - 1) * page_size
    if start >= total:
        return None
    return [{"item_id": i} for i in range(start, min(start + page_size, total))]


class KeyPartition(InputPartition):
    def __init__(self, key: dict):
        self.key = key


class PaginatedHttpReader(DataSourceReader):
    def __init__(self, schema, options):
        self.schema = schema
        self.keys = json.loads(options.get("keys", "[]"))
        self.fetcher_ref = options["fetcher"]
        self.max_pages = int(options.get("max_pages", "100000"))

    def partitions(self):
        return [KeyPartition(k) for k in self.keys]

    def read(self, partition: KeyPartition | None) -> Iterator[tuple]:
        if partition is None:  # zero keys -> Spark passes one None partition
            return
        fetch_page = resolve_fetcher(self.fetcher_ref)
        names = [f.name for f in self.schema.fields]
        key = partition.key
        for page in range(1, self.max_pages + 1):
            rows = fetch_page(key, page)
            if not rows:
                break  # empty page terminates (dags/etl.py:58-59)
            for r in rows:
                merged = {**key, **r}  # key columns ride along (provenance)
                yield tuple(merged.get(n) for n in names)


class PaginatedHttpDataSource(DataSource):
    """spark.read.format("paginated_http") — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "paginated_http"

    def reader(self, schema) -> PaginatedHttpReader:
        return PaginatedHttpReader(schema, self.options)
