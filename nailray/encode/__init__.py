"""The encode core: a distributed per-column lightweight-compression
pipeline (the engine's north star).

Modules:
- ``codecs``: dict / RLE / FSST-style / bit-pack / frame-of-reference
  codecs, pure numpy+pyarrow, each with encode/decode/estimate and
  bit-exact round-trip.
- ``stats``: per-chunk sampled statistics (cardinality, runs,
  sortedness, entropy) feeding codec auto-selection.
- ``select``: the codec chooser.
- ``partition``: explicit hash partitioning on ``repo`` with skew
  splitting of giant repos.
- ``manifest``: per-partition checkpoint/lineage manifest + resume.
- ``pipeline``: read → stats → partition → actor-pool encode → write →
  decode-verify, all as streaming Ray Data stages.

Ancestor in the reference: ``nail optimize``
(/root/reference/src/commands/optimize.rs) — which advertises
compression/dictionary control but discards its WriterProperties
(optimize.rs:254-262); this engine actually delivers per-column
encoding, distributed.
"""
