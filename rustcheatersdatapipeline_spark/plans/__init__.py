"""Declared query suites.

- ``queries``  — SURVEY.md §2.9 Q1-Q30: the reference-parity contract.
- ``training`` — training-data pipeline extensions (dedup, similarity,
  text analysis) over the ``documents`` / ``embeddings`` tables.
- ``insights`` — SURVEY.md §2.6 A1-A8 dashboard-insight query shapes.
"""
