"""Large-scale data-pipeline operators: dedup, similarity, text analysis,
multimodal plumbing, skew mitigation, and temporal joins."""

from . import (  # noqa: F401
    bucketing,
    curation,
    dedup,
    joins,
    layout,
    multimodal,
    sampling,
    similarity,
    sketches,
    skew,
    text,
)
