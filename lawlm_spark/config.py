"""Engine configuration mirroring the reference's config.yml keys
(reference: config.yml:1-61), one source of truth (fixes ref bugs
B2/B4/B5 — dead keys and conflicting defaults).

Values are the reference's; engine-specific knobs live in session.py.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class ChunkingConfig:  # config.yml:5-17
    chunk_size: int = 1536
    chunk_overlap: int = 300
    min_chunk_size_chars: int = 400
    min_text_size: int = 50
    separators: tuple[str, ...] = ("\n\n", ". ", "? ", "! ", "\n", " ", "")


@dataclass(frozen=True)
class VectorizationConfig:  # config.yml:20-25 (+B4/B5 resolved: one value)
    model_name: str = "BAAI/bge-small-en-v1.5"
    vector_size: int = 384
    device: str = "cpu"
    batch_size: int = 16  # the value actually used (data_extraction.py:271)


@dataclass(frozen=True)
class ApiConfig:  # config.yml:43-46; opinion_utills.py:27-39
    request_delay: float = 0.5
    max_retries: int = 3
    retry_delay: float = 2.0
    citation_types: tuple[str, ...] = (  # config.yml:26-34 priority order
        "html_with_citations",
        "plain_text",
        "html_columbia",
        "html_lawbox",
        "html_anon_2020",
        "html",
    )


@dataclass(frozen=True)
class RagConfig:  # config.yml:58-60; app.py:151-170
    max_results: int = 3
    score_threshold: float = 0.4  # Qdrant-scale; RRF-sum scale differs (plans/rag.py)
    rrf_prefetch_multiplier: int = 5
    rrf_k: int = 60


@dataclass(frozen=True)
class EngineConfig:
    chunking: ChunkingConfig = field(default_factory=ChunkingConfig)
    vectorization: VectorizationConfig = field(default_factory=VectorizationConfig)
    api: ApiConfig = field(default_factory=ApiConfig)
    rag: RagConfig = field(default_factory=RagConfig)


DEFAULT = EngineConfig()
