"""Maintenance and LLM-data-pipeline operators.

- ``dedup``      — exact + near-duplicate detection (MinHash/LSH, SimHash,
  n-gram Jaccard, embedding cosine) designed for 100 TB corpora.
- ``similarity`` — similarity search over embedding columns (brute-force
  cosine top-k baseline; LSH-bucketed scale path).
- ``text``       — text analysis: language ID, quality scoring, token
  counting, document fingerprinting.
- ``multimodal`` — binary-column plumbing for image/audio/video payloads.
- ``temporal``   — as-of join, interval join, gap sessionization.
- ``curation``   — decontamination, PII redaction, repetition stats,
  corpus-global span dedup (C4-style).
- ``mixing``     — temperature mixture weights, token-budget sampling
  (distributed prefix sum), deterministic global shuffle.
- ``lm``         — bigram-LM perplexity scoring for quality filtering
  (capped broadcast model, CCNet-style).
- ``skew``       — salting patterns for heavy-hitter keys (top-k, exact
  distinct counts, replicate joins) beyond what AQE covers.
"""
