"""Token-budget sequence packing (training-data prep): assign documents
to fixed-budget bins by cumulative token count.

The practical packing strategy large-scale pipelines use for building
training sequences: order documents deterministically, run a cumulative
token sum, and place each document in bin floor(cumsum_before/budget) —
a document that straddles a boundary belongs to the bin where it
started, so bins can overflow by at most one document (no document is
split, no global re-balancing pass).  One window over the ordering — no
driver loop, no UDF.

Scale shape: a single global cumsum window would funnel the corpus
through one task.  `shard_col` partitions the window (pack per shard —
e.g. per court, per date bucket, per hash(doc_id)%k); bins are then
(shard, bin_id) pairs and the window parallelizes across shards.  The
unsharded form stays available for small corpora and the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from lawlm_spark.functions.text import word_count


def pack_documents(
    docs: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    shard_col: str | Column | None = None,
    token_col: str | None = None,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(id, n_tokens, [shard,] *keep_cols, bin_id, offset_in_bin).

    bin_id    = floor(tokens-before-this-doc / budget) within the shard
    offset_in_bin = tokens before this doc relative to its bin's start

    token_col: use a precomputed token-count column instead of the
    canonical tokenizer (e.g. BPE-ish counts for byte budgets).
    keep_cols: input columns carried through to the output — cheaper
    than re-joining metadata afterwards (Spark shares no subplans, so a
    self-join would execute the upstream pipeline twice).
    """
    toks = (
        F.col(token_col) if token_col else word_count(F.col(text_col))
    ).cast("long")
    out_cols = [F.col(id_col), toks.alias("n_tokens")]
    out_cols += [F.col(c) for c in keep_cols]
    if shard_col is not None:
        shard = F.col(shard_col) if isinstance(shard_col, str) else shard_col
        out_cols.append(shard.alias("shard"))
        w = Window.partitionBy(shard).orderBy(F.col(id_col))
    else:
        # single-partition window: fine for oracle/small corpora; pass
        # shard_col at scale (documented above)
        w = Window.orderBy(F.col(id_col))
    before = F.coalesce(
        F.sum(toks).over(w.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)
    )
    return docs.select(
        *out_cols,
        F.floor(before / budget).cast("int").alias("bin_id"),
        (before % budget).cast("long").alias("offset_in_bin"),
    )


def pack_manifest(
    packed: DataFrame,
    id_col: str = "doc_id",
    shard_col: str | None = None,
) -> DataFrame:
    """([shard,] bin_id, n_docs, bin_tokens, segments): one row per BIN
    with its ordered segment list — the manifest a training loader
    consumes directly (each segment = (doc, offset, length): where the
    document's tokens sit inside the packed sequence, which is also
    exactly the attention-mask boundary list).

    `packed` is pack_documents output.  The segment array is built with
    sort_array over (offset, id, len) structs — deterministic order
    inside the aggregate regardless of shuffle arrival order, which is
    what makes a manifest hash-certifiable (and reproducible across
    reruns: the loader sees byte-identical manifests).  One keyed
    aggregate over the packed table; manifests are bin-sized rows, and
    bins are budget-bounded, so rows stay small at any corpus size.
    """
    keys = ([shard_col] if shard_col else []) + ["bin_id"]
    seg = F.struct(
        F.col("offset_in_bin").alias("offset"),
        F.col(id_col).alias("doc"),
        F.col("n_tokens").alias("length"),
    )
    return (
        packed.groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("bin_tokens"),
            F.sort_array(F.collect_list(seg)).alias("segments"),
        )
    )
