"""Pipeline configuration with the reference's defaults.

Mirrors the env-tunable knobs of the reference (``llm_food/config.py``)
as a validated dataclass fixed at pipeline-build time.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class ClassifierConfig:
    """PDF text/scanned classifier thresholds.

    Identical defaults to the reference (llm_food/pdf_utils.py:16-68,
    llm_food/config.py:56-69): sample clamp(ceil(sqrt(pages)), 2, 20)
    evenly-spaced pages; text-based iff >= 70% of sampled pages have
    >= 75 words.
    """

    sample_min: int = 2
    sample_max: int = 20
    word_threshold: int = 75
    text_ratio: float = 0.7


@dataclass(frozen=True)
class ChunkConfig:
    """Chunking parameters (llm_food/models.py:8-11, 25-36).

    Defaults token/512/128; invariant 0 < size, 0 <= overlap < size
    (models.py:27-36 → HTTP 422; here → ValueError at build time).
    """

    strategy: str = "token"   # token | sentence | recursive
    chunk_size: int = 512
    chunk_overlap: int = 128

    def __post_init__(self) -> None:
        if self.strategy not in ("token", "sentence", "recursive"):
            raise ValueError(f"unknown chunk strategy {self.strategy!r}")
        if self.chunk_size <= 0:
            raise ValueError("chunk_size must be > 0")
        if not (0 <= self.chunk_overlap < self.chunk_size):
            raise ValueError("chunk_overlap must satisfy 0 <= overlap < size")


@dataclass(frozen=True)
class ExtractConfig:
    """Extraction pipeline knobs."""

    # Size guard: reference MAX_FILE_SIZE_MB (llm_food/config.py:31-44).
    # Oversize rows become status='failed' instead of HTTP 413.
    max_payload_bytes: int = 50 * 1024 * 1024
    # Rows with payloads above this go to the dedicated whale leg
    # (batch_size=1 actor pool) so one giant PDF can't stall a batch.
    big_doc_threshold: int = 4 * 1024 * 1024
    # Output layout: number of url-hash partitions.
    num_partitions: int = 16
    classifier: ClassifierConfig = field(default_factory=ClassifierConfig)
    # PDF backend selector (reference PDF_BACKEND, llm_food/config.py:50-51
    # + registry app.py:78-91).  Canonical modes: "auto" classifies then
    # routes structured vs plain; "structured" = reflowed markdown;
    # "structured_layout" = line-preserving markdown (M5);
    # "plain" = text only.  The reference's four backend names are
    # accepted as aliases: pdf_oxide → structured, pymupdf4llm →
    # structured_layout, pypdf2 → plain, gemini → structured (the OCR leg
    # is replaced by the deterministic structured extractor, M7).
    pdf_backend: str = "auto"

    # reference name → canonical mode (llm_food/app.py:78-91)
    PDF_BACKEND_ALIASES = {
        "pdf_oxide": "structured",
        "pymupdf4llm": "structured_layout",
        "pypdf2": "plain",
        "gemini": "structured",
    }
    _PDF_MODES = ("auto", "structured", "structured_layout", "plain")

    def __post_init__(self) -> None:
        if (self.pdf_backend not in self._PDF_MODES
                and self.pdf_backend not in self.PDF_BACKEND_ALIASES):
            # startup ValueError mirrors app.py:90-91
            raise ValueError(f"invalid pdf_backend {self.pdf_backend!r}")

    @property
    def resolved_pdf_backend(self) -> str:
        """Canonical mode after alias resolution."""
        return self.PDF_BACKEND_ALIASES.get(self.pdf_backend, self.pdf_backend)
