"""Driver attestation for the distributed HTTP ingestion stack
(sources/http.py) — SURVEY §2 rows 2-4 (retrying fetch with backoff,
429-awareness, parallel fan-out) were the last tests-only rows with
an oracle-expressible core: the SOCKET is environment-blocked, but
the retry-policy state machine around it is a pure function of the
injected fetcher's behavior, so its outcome is closed-form.

The fake transport is deliberately adversarial and deterministic,
keyed on the job id parsed from each URL:

* id % 10 == 9  -> permanent 429 (rate-limited forever): the policy
  must EXHAUST its 3 attempts and surface status 429;
* otherwise     -> fails (id % 3) times before succeeding — 429s for
  even ids (the longer-backoff branch), generic errors for odd ids —
  so n_attempts == id % 3 + 1 and the final status is 200.

Per-URL attempt counting lives in the per-partition session object
(a dict from the injected session_factory), which is exactly the
reference's requests.Session lifecycle (base_scraper.py:35-51) —
one session created per partition, reused across every row and
retry in it. Sleeps are injected as no-ops, so the audit runs the
real backoff code paths without the wall-clock.

The oracle recomputes every aggregate from the documents table and
the same closed-form rules — attempts, exhaustions, status sums —
so a regression in the retry loop (off-by-one attempts, swallowed
429, wrong terminal status) flips the driver row red.

Scale shape: the fetch itself is mapInPandas over url-hash
partitions (zero shuffles — Spark task parallelism IS the reference's
thread pool); the audit adds one tiny aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jobminer_spark.registry import query
from jobminer_spark.sources import load_table
from jobminer_spark.sources.http import RetryPolicy, TooManyRequests


def _parse_id(url: str) -> int:
    return int(url.rsplit("/", 1)[1])


def deterministic_fetcher(session: dict, url: str) -> tuple[int, str]:
    """The adversarial fake transport described in the module doc.
    ``session`` is the per-partition state dict — per-URL attempt
    counts surviving across the retry loop prove the session object
    is created once per partition and reused."""
    key = _parse_id(url)
    n = session[url] = session.get(url, 0) + 1
    if key % 10 == 9:
        raise TooManyRequests(url)
    if n <= key % 3:
        if key % 2 == 0:
            raise TooManyRequests(url)
        raise ValueError(url)
    return 200, f"ok{key}"


@query(
    "http_fetch_retry_audit",
    oracle="""
    WITH ids AS (SELECT doc_id AS k FROM documents),
    expect AS (
      SELECT k,
             CASE WHEN k % 10 = 9 THEN 3 ELSE k % 3 + 1 END AS attempts,
             CASE WHEN k % 10 = 9 THEN 429 ELSE 200 END AS status
      FROM ids
    )
    SELECT
      (SELECT COUNT(*) FROM expect) AS n_urls,
      (SELECT COUNT(*) FROM expect WHERE status = 200) AS n_ok,
      (SELECT COUNT(*) FROM expect WHERE status = 429) AS n_exhausted,
      (SELECT CAST(SUM(attempts) AS BIGINT) FROM expect) AS sum_attempts,
      CAST(0 AS BIGINT) AS n_wrong_rows
    """,
)
def http_fetch_retry_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runs the REAL fetch stack — per-partition sessions, the retry
    loop with both backoff branches, attempt accounting — over the
    deterministic fake transport, then scores every row against its
    closed-form expectation (attempts, terminal status, body). The
    oracle restates the totals independently; n_wrong_rows pins
    per-row agreement, not just aggregate luck."""
    from jobminer_spark.sources.http import fetch_url_frame

    urls = load_table(spark, sf_dir, "documents").select(
        F.concat(F.lit("https://feed.example/job/"), F.col("doc_id")).alias(
            "url"
        )
    )
    fetched = fetch_url_frame(
        urls,
        fetcher=deterministic_fetcher,
        session_factory=dict,
        policy=RetryPolicy(sleep=lambda _s: None),
    )
    k = F.split(F.col("url"), "/").getItem(4).cast("long")
    scored = fetched.select(
        "status",
        "n_attempts",
        k.alias("k"),
        F.when(F.col("url").isNotNull(), F.col("body")).alias("body"),
    ).select(
        "status",
        "n_attempts",
        # null-safe comparisons throughout (r9 ADVICE): `body != x`
        # evaluates to NULL on a NULL body, and count(when(wrong, 1))
        # treats NULL as not-wrong — a NULL-body regression in
        # fetch_url_frame with correct status/attempts would slip
        # through a plain `!=`.
        (
            F.when(
                F.col("k") % 10 == 9,
                ~F.col("status").eqNullSafe(429)
                | ~F.col("n_attempts").eqNullSafe(3)
                | ~F.col("body").eqNullSafe(""),
            ).otherwise(
                ~F.col("status").eqNullSafe(200)
                | ~F.col("n_attempts").eqNullSafe(F.col("k") % 3 + 1)
                | ~F.col("body").eqNullSafe(F.concat(F.lit("ok"), F.col("k")))
            )
        ).alias("wrong"),
    )
    return scored.agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.count(F.when(F.col("status") == 200, 1)).alias("n_ok"),
        F.count(F.when(F.col("status") == 429, 1)).alias("n_exhausted"),
        F.sum("n_attempts").cast("long").alias("sum_attempts"),
        F.count(F.when(F.col("wrong"), 1)).alias("n_wrong_rows"),
    )
