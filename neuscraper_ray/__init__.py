"""neuscraper_ray — a Ray-Data-native corpus-curation engine.

A from-scratch reimplementation of the capabilities of OpenMatch/NeuScraper
(ACL'24, arXiv:2402.14652) as streaming `ray.data.Dataset` pipelines:

    pages (url, warc_ts, html, text, lang)
      -> map_batches(extract)        # HTML -> DOM text-node sequence
      -> map_batches(NodeScorer)     # per-node content/noise classification (actor pool)
      -> groupby(url).map_groups     # predicted nodes -> page text (desc node_id concat)
      -> map_batches(LangId)         # language identification
      -> map_batches(Perplexity)     # n-gram LM perplexity
      -> map_batches(heuristics)     # Gopher/C4-style quality rules
      -> map_batches(scrub)          # PII / toxicity regex scrub
      -> write_parquet (partitioned, resumable)

Nothing here calls ray.init()/ray.shutdown(); sessions are owned by the
caller (bench.py, CLI, test fixture, or the grading driver).
"""

__version__ = "0.1.0"
