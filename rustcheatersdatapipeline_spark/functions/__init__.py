"""Reusable column-level primitives for the training-data extensions.

- ``text``       — portable hashing, shingling, tokenization, quality.
- ``similarity`` — MinHash permutations, SimHash, cosine machinery.

Everything here is built from JVM-side ``pyspark.sql.functions`` so the
hot path stays inside whole-stage codegen; the only Python-side compute
is constant generation (permutation coefficients, marker word lists).
"""
