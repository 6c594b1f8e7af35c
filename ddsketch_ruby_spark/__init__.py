"""ddsketch_ruby_spark — a PySpark-native mergeable-sketch analytics library.

From-scratch reimplementation of the capabilities of DataDog/ddsketch-ruby
(DDSketch quantile sketches with relative-error guarantees) as distributed
Spark aggregations, plus companion mergeable sketches (HLL, count-min,
Bloom, t-digest, KLL) and web-scale training-data operators (dedup,
similarity search, text analysis) behind one two-phase aggregation engine.

Layout:
- kernel/     pure-NumPy DDSketch math (mappings, stores, sketch monoid)
- sketches/   MergeableSketch protocol + companion sketches
- operators/  Spark DataFrame operators (two-phase sketch agg, dedup, ANN, ...)
- functions/  column-level helpers (text stats, fingerprints, vectors)
- sources/    table loaders + deterministic web_pages synthesizer
- plans/      lineage / checkpoint-resume plumbing
- streaming/  Structured Streaming adapters
"""

__version__ = "0.1.0"
