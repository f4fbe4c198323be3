"""Reusable column-level primitives for the training-data extensions.

- ``text``       — portable hashing, shingling, tokenization, quality.
- ``similarity`` — MinHash permutations, SimHash, cosine machinery.
- ``normalize``  — NFKC+casefold Unicode normalization (Arrow UDF).
- ``multimodal`` — binary media columns: typed metadata + header decode.
- ``pixels``/``jpeg``/``avi`` — FULL payload decode (PNG, GIF-LZW,
  baseline JPEG, MJPEG/DIB AVI, PCM WAV), pure stdlib+numpy.
- ``phash``      — DCT perceptual hash + banded image near-dup.
- ``audio``      — spectral/temporal features over decoded PCM.
- ``imaging``    — deterministic resize + frame sampling, lossless
  PNG re-encode.

The relational primitives are built from JVM-side
``pyspark.sql.functions`` so the hot path stays inside whole-stage
codegen; payload decode is the declared Arrow ``mapInPandas`` boundary
(there is no JVM codec), always reduced to bounded per-item rows.
"""
