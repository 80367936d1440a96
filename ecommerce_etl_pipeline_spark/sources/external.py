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


def http_json_fetch(
    host: str,
    port: int,
    path_for: Callable[[Row], str],
    parse: Callable[[Row, object], Iterator[dict]],
    *,
    timeout_s: float = 5.0,
) -> FetchFn:
    """REAL-socket fetch function for :func:`fetch_external_rows`: one
    ``http.client.HTTPConnection`` per PARTITION (honoring the
    one-connection-per-partition contract), a GET per seed row, JSON body
    handed to ``parse``. Non-200 responses and socket timeouts raise, so
    :func:`with_retries` (app-level) and Spark task retry (scheduler-level)
    both see genuine I/O failures — the live-server path the reference's
    scrape loop exercised with a browser (web_scraping_dag.py:63-135).

    Everything here is serialized by value into the executor: keep ``parse``
    and ``path_for`` self-contained closures.
    """

    def fetch(part: Iterable[Row]) -> Iterator[dict]:
        import http.client
        import json as _json

        conn = http.client.HTTPConnection(host, port, timeout=timeout_s)
        try:
            for r in part:
                conn.request("GET", path_for(r), headers={"Connection": "keep-alive"})
                resp = conn.getresponse()
                body = resp.read()  # must drain before reusing the connection
                if resp.status != 200:
                    raise RuntimeError(f"HTTP {resp.status} for {path_for(r)}")
                yield from parse(r, _json.loads(body))
        finally:
            conn.close()

    return fetch


def with_retries(
    fetch: FetchFn,
    *,
    max_attempts: int = 3,
    base_delay_s: float = 0.5,
    sleep: Callable[[float], None] | None = None,
) -> FetchFn:
    """Wrap a fetch function with bounded exponential-backoff retries —
    the flake-tolerance the reference's scrape loop needed around its live
    browser (web_scraping_dag.py:63-135), expressed once as an adapter.

    Retries whole PARTITIONS (the fetch contract is per-partition): on the
    last attempt the exception propagates so Spark's own task retry/
    blacklisting takes over — two independent layers, app-level for
    transient remote flakes, scheduler-level for bad executors. ``sleep``
    is injectable so tests assert the backoff schedule deterministically.
    """
    import time as _time

    do_sleep = sleep if sleep is not None else _time.sleep

    def wrapped(part: Iterable[Row]) -> Iterator[dict]:
        rows = list(part)  # fetch may be a generator; retries need a replay
        attempt = 0
        while True:
            try:
                # materialize the attempt before emitting anything: a fetch
                # that fails mid-stream must not leave half its rows behind
                # for the retry to duplicate (buffer is bounded by partition
                # size, which max_concurrency already controls)
                results = list(fetch(iter(rows)))
                break
            except Exception:
                attempt += 1
                if attempt >= max_attempts:
                    raise
                do_sleep(base_delay_s * (2 ** (attempt - 1)))
        yield from results

    return wrapped
