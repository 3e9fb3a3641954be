"""Batch embedding operators (O26/O27, SURVEY.md §2.4) via mapInPandas.

The reference embeds on the driver with a SentenceTransformer loaded
once per process and batch size min(n, 16) (reference:
data-ingestion/data_extraction.py:253-276, 364-367; query path
chatbot/app.py:96-99, 139-142).  The Spark-native shape:

  mapInPandas over Arrow batches; the model is an EXECUTOR-LOCAL
  singleton (loaded lazily once per python worker, never serialized
  through the closure), so a 1000-executor cluster loads 1000 models,
  not 1 per task.  Batch size is governed by
  spark.sql.execution.arrow.maxRecordsPerBatch, not a hand-rolled loop.

Model plug points:
  - default = the deterministic fake (same math as
    functions/vectors.fake_embedding, verified equal in tests) so
    correctness gates are bit-reproducible without torch;
  - a real sentence-transformers model is used iff installed AND
    explicitly requested by name — the container has no torch, so the
    import is gated and tests never touch it.

BGE query prefix (O27, app.py:96-99): prepended iff the model name
contains 'bge', matching the reference's conditional.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import ArrayType, DoubleType, StructField, StructType

BGE_QUERY_PREFIX = "Represent this query for searching relevant legal passages: "
DEFAULT_DIM = 64
FAKE_MODEL = "fake"

_MODEL_CACHE: dict[str, object] = {}  # executor-local (one per python worker)


def fake_embed_one(text: str, dim: int = DEFAULT_DIM, seed: str = "v1") -> list[float]:
    """Pure-Python twin of functions/vectors.fake_embedding: md5 per
    dimension -> [-1, 1), unit-normalized.  Bit-equal to the column
    expression (md5 -> first 8 hex -> int, same fold), tested."""
    raw = []
    for i in range(dim):
        h = hashlib.md5(f"{seed}:{i}:{text}".encode()).hexdigest()[:8]
        raw.append((int(h, 16) % 2000.0 - 1000.0) / 1000.0)
    nrm = sum(x * x for x in raw) ** 0.5
    return [x / nrm for x in raw] if nrm > 0 else raw


def _get_model(model_name: str, dim: int):
    """Lazy executor-local singleton.  Returns a callable texts->vectors."""
    key = f"{model_name}:{dim}"
    if key not in _MODEL_CACHE:
        if model_name == FAKE_MODEL:
            _MODEL_CACHE[key] = lambda texts: [fake_embed_one(t, dim) for t in texts]
        else:
            try:
                from sentence_transformers import SentenceTransformer  # noqa: PLC0415
            except ImportError as e:  # pragma: no cover - torch not in container
                raise NotImplementedError(
                    f"real embedding model {model_name!r} requires "
                    "sentence-transformers; use model_name='fake' here"
                ) from e
            st = SentenceTransformer(model_name, device="cpu")
            _MODEL_CACHE[key] = lambda texts: [
                v.tolist() for v in st.encode(list(texts), normalize_embeddings=True)
            ]
    return _MODEL_CACHE[key]


def embed_texts(
    df: DataFrame,
    text_col: str,
    out_col: str = "embedding",
    model_name: str = FAKE_MODEL,
    dim: int = DEFAULT_DIM,
    is_query: bool = False,
) -> DataFrame:
    """O26/O27: append an `array<double>` embedding column via mapInPandas.

    is_query=True applies the BGE prefix rule (O27) before encoding.
    Output schema/order = input schema + out_col (column order preserved,
    rows pass through 1:1 — safe under AQE and task retries because the
    fake model is deterministic and real models are row-wise pure).
    """
    prefix = BGE_QUERY_PREFIX if (is_query and "bge" in model_name.lower()) else ""
    # fresh StructType — StructType.add would mutate df's cached schema
    out_schema = StructType(
        list(df.schema.fields) + [StructField(out_col, ArrayType(DoubleType()))]
    )
    cols = df.columns

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = _get_model(model_name, dim)
        for pdf in batches:
            texts = [prefix + (t or "") for t in pdf[text_col]]
            pdf = pdf.copy()
            pdf[out_col] = model(texts)
            yield pdf[cols + [out_col]]

    return df.mapInPandas(run, schema=out_schema)
