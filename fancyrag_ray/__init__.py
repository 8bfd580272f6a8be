"""fancyrag_ray — a Ray-Data-native knowledge-graph construction engine.

Built from scratch with the query / data-processing capabilities of the
reference FancyRAG system (see SURVEY.md), re-expressed as streaming
``ray.data.Dataset`` pipelines:

    documents (interleaved text+media spans)
      → chunker            (stateless map_batches, Arrow in/out)
      → embedder           (actor pool, deterministic hash projection)
      → triple extractor   (actor pool, rule-based, closed-world schema)
      → entity linker      (actor pool holding a broadcast alias index)
      → canonicalization   (groupby exact-match + min-label propagation)
      → graph materialize  (reduce-by-key dedup of nodes / edges, parquet)
      → QA gate            (distributed aggregations + thresholds)

No module in this package calls ``ray.init`` / ``ray.shutdown`` — the
driver, ``bench.py`` or the test fixture owns the Ray session.
"""

__version__ = "0.1.0"
