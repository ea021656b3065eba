"""language_identification_ray — a Ray-Data-native language-ID + quality-filter
+ PII/toxicity-scrub engine.

A from-scratch re-expression of the capabilities of the reference repo
``averykhoo/language-identification`` (see SURVEY.md) as an idiomatic Ray Data
pipeline over Arrow batches of Common-Crawl-style web pages:

    ray.data.read_parquet(pages)
      → map_batches(decode + html-extract + truncate)        # stateless tasks
      → map_batches(QualityStats)                            # vectorized token stats
      → map_batches(LangIdScorer, concurrency=N)             # actor pool, warm model
      → map_batches(PerplexityScorer, concurrency=N)         # actor pool, KN LM table
      → map_batches(scrub + rules)                           # PII regexes + keep/drop
      → write_parquet(partition_cols=..., salted lang key)

Nothing here calls ``ray.init()`` — the caller (bench.py, tests/conftest.py,
or the driver) owns the Ray session.
"""

__version__ = "0.1.0"
