"""llm_food_ray — a from-scratch Ray-Data-native batch extraction engine.

Re-expresses the extraction semantics of the reference service
(altaidevorg/llm-food: content-type dispatch → per-format extractor →
markdown per document, content-hashed, optionally chunked) as idiomatic
``ray.data.Dataset`` pipelines over Parquet shards of Common-Crawl-style
pages ``(url, warc_ts, html, text, lang)``.

Layout:
    functions/  pure extraction semantics (no Ray): html/pdf/chunk/textstats
    stages/     map_batches stage callables (extract, chunk, dedup, similarity)
    sources/    readers + deterministic pages synthesis
    pipelines/  end-to-end composed Dataset pipelines (partitioning, manifests)
    state/      per-partition lineage manifests (resume support)
"""

__version__ = "0.1.0"
