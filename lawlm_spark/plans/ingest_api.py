"""E1 end-to-end: REST API -> opinions -> chunks index (SURVEY.md §3 E1,
reference data-ingestion/data_extraction.py:320-444).

Composition and ORDER (the order is the optimization — SURVEY.md §4):

  O1  paginated_scan (bronze dockets)
  O22 anti-join against already-ingested docket ids  <- BEFORE the
      expensive nested fetches; Catalyst cannot hoist filters across
      python UDFs, so the builder places the dedup here by hand
  O2  expand_nested (clusters -> sub-opinions)
  O4  first-non-null text coalesce with provenance (config.yml:26-34)
  O5  min-length gate (>= 100 chars, data_extraction.py:182-184)
  O11-O15 enhanced text processing (clean/citations/entities/stats)
  O17+O16 chunking, O18 keys (uuid5 point ids)

Returns (opinions, chunks) DataFrames matching SURVEY.md §1.3 schemas.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lawlm_spark.functions.keys import chunk_id, chunk_key, uuid5
from lawlm_spark.functions.text import enhanced_processing
from lawlm_spark.operators.chunking import recursive_split_chunks
from lawlm_spark.operators.relational import anti_join_new, coalesce_with_provenance
from lawlm_spark.sources.rest import Fetcher, expand_nested, paginated_scan

# reference config.yml:26-34 citation_types priority order
TEXT_FIELDS = (
    "html_with_citations",
    "plain_text",
    "html_columbia",
    "html_lawbox",
    "html_anon_2020",
    "html",
)
MIN_OPINION_CHARS = 100  # data_extraction.py:182-184


def ingest_from_api(
    spark: SparkSession,
    cursor_ranges: list[tuple[str, str | None]],
    fetcher: Fetcher,
    existing_docket_ids: DataFrame | None = None,
    max_pages_per_range: int = 10,
) -> tuple[DataFrame, DataFrame]:
    """Run E1 from the API to the chunk index.  Returns (opinions, chunks)."""
    dockets = paginated_scan(spark, cursor_ranges, fetcher, max_pages_per_range)
    if existing_docket_ids is not None:
        dockets = anti_join_new(dockets, existing_docket_ids, "docket_id")  # O22

    fetched = expand_nested(dockets, fetcher)  # O2/O3

    fields = [
        (name, F.get_json_object(F.col("raw_json"), f"$.{name}")) for name in TEXT_FIELDS
    ]
    coalesced = coalesce_with_provenance(fields, value_name="raw_text")  # O4
    opinions = (
        fetched.withColumns(coalesced)
        .filter(F.length(F.trim("raw_text")) >= MIN_OPINION_CHARS)  # O5
        .withColumns(enhanced_processing(F.col("raw_text")))  # O11-O15
        # Opinion-level metadata straight out of the landed JSON
        # (reference opinion.py:29-34; Catalyst-side extraction so the
        # python fetch UDF stays the only opaque stage).
        .select(
            "docket_id",
            "cluster_id",
            "opinion_id",
            F.coalesce("court", F.lit("unknown")).alias("court"),
            F.to_date("date_filed").alias("date_filed"),
            "case_name",  # B3 fix: populated from cluster JSON
            "judges",
            "precedential_status",
            F.coalesce(
                F.get_json_object("raw_json", "$.author_id"), F.lit("")
            ).alias("author"),
            F.coalesce(
                F.get_json_object("raw_json", "$.type"), F.lit("unknown")
            ).alias("opinion_type"),
            F.get_json_object("raw_json", "$.sha1").alias("sha1"),
            F.get_json_object("raw_json", "$.download_url").alias("download_url"),
            F.to_timestamp(
                F.get_json_object("raw_json", "$.date_created")
            ).alias("date_created"),
            F.to_timestamp(
                F.get_json_object("raw_json", "$.date_modified")
            ).alias("date_modified"),
            "source_field",
            "raw_text",
            "opinion_text",
            "citations",
            "legal_entities",
            "text_stats",
            "page_cursor",
            "page_index",
        )
    )

    # Denormalize the full opinion metadata into every chunk (reference
    # chunk.py:15-23 to_dict) by CARRYING the columns through the scalar
    # chunk UDF — no join-back, so the fetch lineage executes once.
    payload_cols = tuple(
        c for c in opinions.columns if c not in ("docket_id", "raw_text", "opinion_text")
    )
    ch = recursive_split_chunks(
        opinions, "docket_id", "opinion_text", carry=payload_cols
    )  # O17+O16
    chunks = ch.withColumns(
        {
            "chunk_key": chunk_key(
                F.col("docket_id"), F.col("opinion_id"), F.col("chunk_index")
            ),
            "chunk_id": chunk_id(F.col("opinion_id"), F.col("chunk_index")),
        }
    ).withColumn("point_id", uuid5(F.col("chunk_key"))).withColumn(
        "time_ingested", F.current_timestamp()
    )  # O18
    return opinions, chunks


def resume_cursor(chunks: DataFrame) -> str | None:
    """The page cursor to resume ingestion from — the B1 fix end to end
    (reference qdrant_manager.py:92-106 parsed a field it never wrote,
    so `latest_cursor` was always None and every run restarted at page 1).

    Deterministic max-by: latest time_ingested, tie-broken by the
    monotonic page_index ordinal (a whole batch shares one
    current_timestamp(), so the tie-break decides within a run), then the
    cursor string for full determinism.  page_index — NOT the cursor —
    must carry the intra-run ordering: cursors are opaque tokens and
    'page:9' > 'page:10' lexicographically, so ordering by the string
    would walk resume BACKWARD once a run crosses 10 pages.  Implemented
    as max over a (ts, page_index, cursor) struct — an associative
    aggregate that partial-aggregates map-side, NOT an ungrouped window
    (which would funnel the whole mirror through one partition at scale).
    """
    if "page_index" not in chunks.columns:
        # migration path: mirrors written before page_index existed stay
        # resumable — fall back to the pre-ordinal (ts, cursor) struct
        # (lexicographic cursor tie-break, the old behavior) rather than
        # raising AnalysisException on a column the table never had
        chunks = chunks.withColumn("page_index", F.lit(None).cast("long"))
    row = (
        chunks.filter(F.col("page_cursor").isNotNull())
        .agg(F.max(F.struct("time_ingested", "page_index", "page_cursor")).alias("m"))
        .first()
    )
    return row["m"]["page_cursor"] if row and row["m"] is not None else None
