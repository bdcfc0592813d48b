"""Distributed HTTP ingestion: URL-list DataFrame → fetched pages.

Re-expresses the reference's hand-rolled scan stack (SURVEY.md §2.1
rows 1-5) on Spark's execution model:

  reference                                   engine
  -----------------------------------------   ---------------------------
  ThreadPoolExecutor chunks of 8              task parallelism: repartition(k)
    (pracuj_scraper.py:397-421)                 + one task per partition
  requests.Session reuse per thread           ONE session per PARTITION,
    (base_scraper.py:35-51)                     created in the mapInPandas
                                                iterator before the batch loop
  retry ≤3, backoff base·2ⁿ + jitter,         in-UDF retry loop (below);
    429-aware (base_scraper.py:54-84)           task-level spark.task.maxFailures
                                                covers worker death
  politeness delay 1-2.5 s/request            per-request delay inside the
    (base_scraper.py:61)                        partition — throttling scales
                                                with partition count, matching
                                                the reference's 8-way cap

The container has no network, so the default fetcher raises
NotImplementedError — tests and offline runs inject a deterministic
fake via ``fetcher``. Everything around the socket (partitioning,
session lifecycle, retry policy, batch shape) is real and tested.
"""

from __future__ import annotations

import random
import time
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

FETCH_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("status", T.IntegerType()),
    T.StructField("body", T.StringType()),
    T.StructField("n_attempts", T.IntegerType()),
])


class RetryPolicy:
    """Reference retry semantics (base_scraper.py:54-84): ≤ max_retries
    attempts, exponential backoff base·2ⁿ plus bounded jitter, longer
    wait on HTTP 429."""

    def __init__(
        self,
        max_retries: int = 3,
        base_delay: float = 1.0,
        jitter: float = 3.0,
        politeness: tuple[float, float] = (1.0, 2.5),
        sleep: Callable[[float], None] = time.sleep,
    ) -> None:
        self.max_retries = max_retries
        self.base_delay = base_delay
        self.jitter = jitter
        self.politeness = politeness
        self.sleep = sleep


class TooManyRequests(Exception):
    """Raised by fetchers on HTTP 429."""


def default_session_factory() -> object:
    """Per-partition session init. A networked deployment returns a
    requests.Session with pinned UA/language headers (reference
    base_scraper.py:35-51); this container has no requests/network."""
    raise NotImplementedError(
        "no network in this environment — inject session_factory/fetcher"
    )


def fetch_url_frame(
    urls: DataFrame,
    fetcher: Callable[[object, str], tuple[int, str]],
    session_factory: Callable[[], object] = lambda: object(),
    policy: RetryPolicy | None = None,
    parallelism: int = 8,
) -> DataFrame:
    """DataFrame[url] → DataFrame[url, status, body, n_attempts].

    One fetch session per partition; the reference's CHUNK_SIZE=8
    becomes ``parallelism`` partitions. Deterministic output columns
    make the ingestion testable without sockets.
    """
    pol = policy or RetryPolicy()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        session = session_factory()  # per-partition, reused across batches
        rng = random.Random(0)  # bounded jitter; seeded for test determinism
        for pdf in batches:
            out = {"url": [], "status": [], "body": [], "n_attempts": []}
            for url in pdf["url"]:
                status, body, attempts = -1, "", 0
                # reference base_scraper.py:56 `while retries < max_retries`:
                # max_retries bounds TOTAL attempts, not re-attempts
                for attempt in range(pol.max_retries):
                    attempts = attempt + 1
                    try:
                        pol.sleep(rng.uniform(*pol.politeness))
                        status, body = fetcher(session, url)
                        break
                    except TooManyRequests:
                        status, body = 429, ""
                        pol.sleep(pol.base_delay * (2**attempt) * 2)
                    except Exception:
                        status, body = -1, ""
                        pol.sleep(
                            pol.base_delay * (2**attempt)
                            + rng.uniform(0, pol.jitter)
                        )
                out["url"].append(url)
                out["status"].append(status)
                out["body"].append(body)
                out["n_attempts"].append(attempts)
            yield pd.DataFrame(out)

    return urls.repartition(parallelism, "url").mapInPandas(run, schema=FETCH_SCHEMA)
