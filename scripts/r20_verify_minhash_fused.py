"""One-off: assert the fused Arrow minhash_signatures is byte-identical
to the r19 collect_set-index implementation at sf0.1, and time both.

Run: python scripts/r20_verify_minhash_fused.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from pyspark.sql import functions as F

    from jobminer_spark.operators import dedupe as dd
    from jobminer_spark.session import get_spark
    from jobminer_spark.sources.parquet import load_table

    spark = get_spark("verify-minhash-fused")
    docs = load_table(spark, SF_DIR, "documents")
    docs.count()

    def old_signatures(docs, n=3):
        flat = (
            dd.shingle_doc_lists(docs, n, max_df=dd.SHINGLE_MAX_DF)
            .select(
                (dd._md5_long15(F.col("shingle")) % dd._MH_P).alias("h31"),
                "ds",
            )
            .select(F.explode("ds").alias("doc_id"), "h31")
        )
        mins = [
            F.min((F.lit(a) * F.col("h31") + F.lit(b)) % dd._MH_P).alias(f"mh{i}")
            for i, (a, b) in enumerate(dd._MH_PARAMS)
        ]
        return flat.groupBy("doc_id").agg(*mins)

    t0 = time.perf_counter()
    old_rows = old_signatures(docs).collect()
    t_old = time.perf_counter() - t0
    t0 = time.perf_counter()
    new_rows = dd.minhash_signatures(docs).collect()
    t_new = time.perf_counter() - t0
    # second pass for a warmer comparison
    t0 = time.perf_counter()
    old_signatures(docs).collect()
    t_old = min(t_old, time.perf_counter() - t0)
    t0 = time.perf_counter()
    dd.minhash_signatures(docs).collect()
    t_new = min(t_new, time.perf_counter() - t0)

    old_m = {r["doc_id"]: tuple(r)[1:] for r in old_rows}
    new_m = {r["doc_id"]: tuple(r)[1:] for r in new_rows}
    assert len(old_rows) == len(old_m) and len(new_rows) == len(new_m)
    assert old_m == new_m, (
        f"MISMATCH: {len(old_m)} old vs {len(new_m)} new; "
        f"first diff: "
        + str(
            next(
                (k, old_m.get(k), new_m.get(k))
                for k in set(old_m) | set(new_m)
                if old_m.get(k) != new_m.get(k)
            )
        )
    )
    print(
        f"IDENTICAL: {len(old_m)} docs x {dd._MH_K} hashes; "
        f"old={t_old:.3f}s new={t_new:.3f}s"
    )


if __name__ == "__main__":
    main()
