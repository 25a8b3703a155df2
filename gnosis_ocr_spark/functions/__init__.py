"""Pure-Python codecs and Column-expression helper functions.

Submodules:
- ``codec_png`` / ``codec_pdf`` — stdlib-only PNG and (subset) PDF codecs used
  by the rasterize/OCR stages (no PIL/poppler in this environment).
- ``scalar`` — the reference's scalar computations as Spark Column helpers
  (SURVEY.md §2.7 F1–F12).
- ``text`` — language-ID, quality scoring, token counting, fingerprinting for
  training-data pipelines (built-in Spark SQL functions, JVM-side).
- ``dedup`` — exact / MinHash-LSH / SimHash / n-gram-Jaccard deduplication.
- ``similarity`` — brute-force and LSH-bucketed cosine top-k over embeddings.
"""
