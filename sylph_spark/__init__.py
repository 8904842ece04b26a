"""sylph_spark — a from-scratch PySpark-native near-duplicate detection and
clustering engine with the query/data-processing capabilities of
bluenote-1577/sylph, re-expressed Spark-first.

Layout:
- ``kernels``    pure-numpy math (hashing, FracMinHash, λ estimators, CI)
- ``codecs``     self-contained image codecs (ppm/bmp/qpng/qjpg) + PSNR/phash
- ``fixtures``   deterministic image+caption corpus generator (seed 42)
- ``oracle``     single-node numpy reference pipeline (ground truth)
- ``config``     SketchConfig — shingle/signature/band parameters
- ``udfs``       Arrow-vectorized pandas UDF wrappers of the kernels
- ``pipeline``   the Spark stages: sketch → counts → LSH → score → verify →
                 cluster → report
- ``io.catalog`` checkpointed table catalog (Iceberg if jars present, else
                 Parquet + manifest/snapshot metadata)
- ``operators``  reusable Spark operator library (dedup, similarity, text)
"""

__version__ = "0.1.0"
