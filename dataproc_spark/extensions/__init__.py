"""Large-scale data-pipeline extensions beyond the reference's surface:
deduplication, similarity search, text analysis, multimodal column
plumbing, and streaming aggregation.

These are first-class operators of this engine (BASELINE.json north-star),
designed shuffle-aware for 100 TB corpora and validated at test scale.
"""
