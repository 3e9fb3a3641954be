"""Property-based tests (hypothesis) for the pure-Python kernels and
the uuid5 column expression."""

from __future__ import annotations

import uuid

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from lawlm_spark.functions.keys import uuid5
from lawlm_spark.operators.chunking import recursive_split
from lawlm_spark.operators.embedding import fake_embed_one

TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), min_size=0, max_size=300
)


@settings(max_examples=200, deadline=None)
@given(TEXT)
def test_recursive_split_properties(text):
    chunks = recursive_split(text, chunk_size=64, overlap=0)
    assert all(len(c) <= 64 for c in chunks)
    assert "".join(chunks) == text  # zero overlap => exact partition
    if text:
        assert chunks


@settings(max_examples=100, deadline=None)
@given(TEXT, st.integers(min_value=8, max_value=32))
def test_recursive_split_overlap_bounds(text, overlap):
    chunks = recursive_split(text, chunk_size=64, overlap=overlap)
    assert all(len(c) <= 64 for c in chunks)


@settings(max_examples=100, deadline=None)
@given(TEXT)
def test_fake_embed_unit_norm(text):
    v = fake_embed_one(text, dim=16)
    assert len(v) == 16
    assert abs(sum(x * x for x in v) - 1.0) < 1e-9


def test_uuid5_property_batch(spark):
    """uuid5 column == Python uuid.uuid5 over a hypothesis-style corpus,
    one Spark job for the whole batch."""
    names = ["", " ", "a", "0" * 100, "\t\n", "ünïcode-Ω≈ç", "a_b_c" * 40] + [
        f"docket_{i}_opinion_{i * 7}_{i % 13}" for i in range(50)
    ]
    df = spark.createDataFrame([(n,) for n in names], ["name"])
    for r in df.select("name", uuid5(F.col("name")).alias("u")).collect():
        assert r["u"] == str(uuid.uuid5(uuid.NAMESPACE_DNS, r["name"]))
