"""Operator families.

SURVEY.md §2 families that need real implementation beyond a one-line
DataFrame expression live here as reusable, tested functions:

- ``dedup.py``       exact / MinHash-LSH / SimHash / n-gram-Jaccard dedup
- ``similarity.py``  brute-force + LSH-bucketed ANN over embeddings
- ``textops.py``     tokenize-explode, quality scoring, language ID, fingerprints
- ``stateful.py``    ST1–ST8 batch formulations as composable transforms
- ``multimodal.py``  binary-column plumbing with Arrow-batched decode stubs

Plan modules (plans/*.py) bind these to the fixture tables and register the
driver-facing queries.
"""
