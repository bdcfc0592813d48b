"""Ingestion plumbing tests: per-partition session reuse, retry with
backoff, 429 handling — sockets replaced by deterministic fakes."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from jobminer_spark.sources.http import RetryPolicy, TooManyRequests, fetch_url_frame


def _urls(spark, n=20):
    return spark.range(n).select(
        F.concat(F.lit("https://example.test/item/"), F.col("id")).alias("url")
    )


def test_fetch_happy_path_reuses_partition_session(spark):
    def session_factory():
        return {"token": "session"}

    def fetcher(session, url):
        assert session["token"] == "session"  # the partition's own session
        return 200, f"<html>{url}</html>"

    out = fetch_url_frame(
        _urls(spark),
        fetcher=fetcher,
        session_factory=session_factory,
        policy=RetryPolicy(sleep=lambda s: None),
        parallelism=4,
    ).collect()
    assert len(out) == 20
    assert all(r.status == 200 and r.n_attempts == 1 for r in out)
    assert all(r.body.endswith(f"{r.url}</html>") for r in out)


def test_fetch_retries_flaky_urls(spark):
    def fetcher(session, url):
        # urls ending in 0 fail twice, then succeed (stateful per task
        # via the session dict — exactly what session reuse is for)
        if url.endswith("0"):
            k = session.setdefault(url, 0)
            session[url] = k + 1
            if k < 2:
                raise ConnectionError("flaky")
        return 200, "ok"

    out = fetch_url_frame(
        _urls(spark),
        fetcher=fetcher,
        session_factory=dict,
        policy=RetryPolicy(sleep=lambda s: None),
        parallelism=2,
    ).collect()
    flaky = [r for r in out if r.url.endswith("0")]
    assert flaky and all(r.status == 200 and r.n_attempts == 3 for r in flaky)
    solid = [r for r in out if not r.url.endswith("0")]
    assert all(r.n_attempts == 1 for r in solid)


def test_fetch_gives_up_after_max_retries_and_marks_429(spark):
    def fetcher(session, url):
        raise TooManyRequests()

    waits = []
    out = fetch_url_frame(
        _urls(spark, 4),
        fetcher=fetcher,
        session_factory=dict,
        policy=RetryPolicy(max_retries=2, sleep=waits.append),
        parallelism=1,
    ).collect()
    # max_retries bounds TOTAL attempts (reference base_scraper.py:56)
    assert all(r.status == 429 and r.n_attempts == 2 for r in out)
