"""Key-derivation operators (O18, SURVEY.md §2.2).

Reference semantics:
  chunk_key = "{docket_id}_{opinion_id}_{chunk_index}"   (chunk.py:10-12)
  chunk_id  = "{opinion_id}_{chunk_index}"               (chunk.py:19)
  point_id  = uuid5(NAMESPACE_DNS, chunk_key)            (data_extraction.py:288)

`uuid5` is implemented as a pure Spark SQL expression over `sha1` —
JVM-side, whole-stage-codegen friendly, no Python UDF — and verified
byte-exact against Python's `uuid.uuid5` in tests (RFC 4122 §4.3).
Deterministic ids make the sink upsert idempotent (safe task retries,
exactly-once-style writes — SURVEY.md §4).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# RFC 4122 DNS namespace 6ba7b810-9dad-11d1-80b4-00c04fd430c8 as raw hex.
_NAMESPACE_DNS_HEX = "6ba7b8109dad11d180b400c04fd430c8"


def chunk_key(doc_id: Column, opinion_id: Column, chunk_index: Column) -> Column:
    return F.concat_ws("_", doc_id, opinion_id, chunk_index)


def chunk_id(opinion_id: Column, chunk_index: Column) -> Column:
    return F.concat_ws("_", opinion_id, chunk_index)


def uuid5(name: Column, namespace_hex: str = _NAMESPACE_DNS_HEX) -> Column:
    """RFC 4122 v5 UUID of `name` under `namespace`, as a column expression.

    uuid5 = sha1(namespace_bytes || utf8(name)); take the first 16 bytes,
    set the version nibble (hex char 13) to '5' and the variant bits of
    byte 8 (hex char 17) to 10xx, then format 8-4-4-4-12.
    """
    digest = F.sha1(F.concat(F.unhex(F.lit(namespace_hex)), F.encode(name, "utf-8")))
    # variant: high nibble of byte 8 -> (nibble & 0x3) | 0x8  ==  "89ab"[nibble % 4]
    variant_nibble = F.substring(
        F.lit("89ab"), (F.conv(F.substring(digest, 17, 1), 16, 10).cast("int") % 4) + 1, 1
    )
    return F.concat_ws(
        "-",
        F.substring(digest, 1, 8),
        F.substring(digest, 9, 4),
        F.concat(F.lit("5"), F.substring(digest, 14, 3)),
        F.concat(variant_nibble, F.substring(digest, 18, 3)),
        F.substring(digest, 21, 12),
    )


def surrogate_id(name: Column) -> Column:
    """md5-based surrogate key — the oracle-portable cousin of `uuid5`
    (DuckDB has no sha1).  Used by validation queries; production points
    use `uuid5` for reference parity."""
    return F.md5(name)
