"""nailray — a Ray-Data-native per-column lightweight-compression and
tabular data-processing engine.

Re-implements the query/data-processing capabilities of the reference
``Vitruves/nail-parquet`` (Rust/DataFusion CLI, see /root/reference) from
scratch on idiomatic Ray Data: every stage is a ``ray.data.Dataset``
transform (``map_batches`` over zero-copy Arrow batches, actor pools for
stateful stages, ``groupby``/``sort``/``repartition`` for wide steps).

The core (package ``nailray.encode``) is a distributed per-column
lightweight-compression pipeline: dictionary, RLE, FSST-style symbol
tables, bit-packing and frame-of-reference, auto-selected per chunk from
sampled statistics, with explicit hash partitioning on ``repo``, skew
splitting, a per-partition checkpoint manifest, and decode verification
(per-row content sha256 bit-identity).

Nothing here calls ``ray.init()``: the caller (CLI, bench, tests, or the
evaluation driver) owns the Ray session.
"""

__version__ = "0.1.0"
