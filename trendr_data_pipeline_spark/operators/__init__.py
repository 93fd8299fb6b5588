"""Composed dataflow operators.

- ``dedup``      : exact, prefix-filtered Jaccard, MinHash-LSH, SimHash
- ``similarity`` : embedding cosine top-k (brute-force + LSH-bucketed)
- ``textquality``: language-ID, quality scoring, fingerprinting
- ``relational`` : as-of join and window-suite helpers
- ``spatial``    : haversine/bbox joins, point-in-polygon refine
- ``classifier`` : reference A1–A8 score aggregates
- ``mentions``   : reference mention pipeline (W1 dedup, F6 decision)
- ``multimodal`` : binary-column plumbing (decode stubs, batch shape)
"""
