"""Per-stage cost split of the curation pipeline at a given SF
(VERDICT r5 #8: ground the 100 TB persist-vs-checkpoint cost model in
numbers).

    python tools/curation_cost.py [sf_dir]

Times, each from a cold cache (median of 3 reps):
  exact_only   stage 1 (fingerprint dedup) + gates, near-dup skipped
  pairs_stage  the shingle/minhash/LSH/Jaccard chain alone (forced pairs)
  curate_pairs full curate, near_dup_strategy='pairs'
  curate_comp  full curate, near_dup_strategy='components' (default)
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from lawlm_spark.functions.text import (
    bpe_ish_token_count,
    fingerprint,
    lang_id,
    quality_score,
    word_count,
)
from lawlm_spark.operators.dedup import minhash_dedup_pairs
from lawlm_spark.plans.curation import curate_documents
from lawlm_spark.session import get_spark
from lawlm_spark.sources.testdata import load_table


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _timed(spark, fn, reps: int = 3) -> float:
    outs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        outs.append(time.perf_counter() - t0)
        spark.catalog.clearCache()
    return round(sorted(outs)[len(outs) // 2], 3)


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("curation-cost", extra_conf={"spark.ui.showConsoleProgress": "false"})
    docs = load_table(spark, sf, "documents")
    docs.count()  # warm file listing

    def exact_only():
        fp = docs.select("doc_id", "text", fingerprint(F.col("text")).alias("_fp"))
        keep = fp.groupBy("_fp").agg(F.min("doc_id").alias("doc_id"))
        exact = fp.join(keep, ["doc_id", "_fp"], "left_semi").drop("_fp")
        out = exact.select(
            "doc_id", "text",
            lang_id(F.col("text")).alias("lang_guess"),
            F.round(quality_score(F.col("text")), 4).alias("quality"),
            word_count(F.col("text")).alias("n_tokens"),
            bpe_ish_token_count(F.col("text")).alias("bpe_tokens"),
        ).filter((F.col("quality") >= 0.5) & (F.col("lang_guess") == "en"))
        _force(out)

    def pairs_stage():
        reg: list = []
        _force(minhash_dedup_pairs(docs, "doc_id", "text", cache_registry=reg))
        for df in reg:
            df.unpersist()

    def curate(strategy: str):
        reg: list = []
        _force(curate_documents(docs, cache_registry=reg, near_dup_strategy=strategy))
        for df in reg:
            df.unpersist()

    results = {
        "exact_only": _timed(spark, exact_only),
        "pairs_stage": _timed(spark, pairs_stage),
        "curate_pairs": _timed(spark, lambda: curate("pairs")),
        "curate_components": _timed(spark, lambda: curate("components")),
        "sf_dir": sf,
    }
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
