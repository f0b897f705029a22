"""Large-scale data-pipeline operators: dedup, similarity, text analysis,
multimodal plumbing, skew mitigation, and temporal joins."""

from . import dedup, joins, multimodal, sampling, similarity, sketches, skew, text  # noqa: F401
