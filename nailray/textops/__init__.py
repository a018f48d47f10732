"""Large-scale training-data operators over text corpora: exact and
near deduplication, language id, quality scoring, token counting,
fingerprinting. All stages are vectorized map_batches / groupby
pipelines designed for the 100 TB documents table."""

from . import dedup, analysis, decontam  # noqa: F401
