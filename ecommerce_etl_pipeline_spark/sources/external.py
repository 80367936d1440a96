"""Generic external-row source — SURVEY.md §2.1 S10.

The reference scrapes competitor prices with Selenium inside an Airflow
task (web_scraping_dag.py:63-135). In the engine that pattern is an I/O
adapter: a seed DataFrame of requests fans out over executors and a
per-partition fetch function yields result rows. One connection per
PARTITION (not per row), bounded fan-out via repartition, and the fetch is
a plain Python callable so tests inject a deterministic fake where the
reference used a live browser.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Iterator

from pyspark.sql import DataFrame, Row
from pyspark.sql.types import StructType

FetchFn = Callable[[Iterable[Row]], Iterator[dict]]


def fetch_external_rows(
    seeds: DataFrame,
    fetch: FetchFn,
    schema: StructType | str,
    *,
    max_concurrency: int = 8,
) -> DataFrame:
    """Fan a seed DataFrame out to ``max_concurrency`` partitions and run
    ``fetch`` once per partition (it receives the partition's seed rows and
    yields plain dicts matching ``schema``).

    ``mapPartitions`` is the sanctioned imperative escape hatch here because
    the work is external I/O, not data transformation — rate limits are
    controlled by the partition count, and failures retry per-partition
    under Spark's task retry policy.
    """
    seeds = seeds.repartition(max_concurrency)

    def run(part: Iterable[Row]) -> Iterator[dict]:
        yield from fetch(part)

    return seeds.rdd.mapPartitions(run).toDF(schema)
