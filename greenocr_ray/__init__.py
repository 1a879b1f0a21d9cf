"""greenocr_ray — a Ray-Data-native main-content extraction engine.

From-scratch reimplementation of the capabilities of martinEst/GreenOCR
(faded-document OCR over interleaved text+media documents) expressed as
idiomatic Ray Data pipelines: ``read_parquet``/``read_lance`` sources,
stateless ``map_batches`` UDFs for text-span cleanup, a stateful
actor-pool ``map_batches`` stage for OCR, explicit skew-aware
partitioning, and partition-granular lineage checkpoints for resume.

Nothing here calls ``ray.init()``/``ray.shutdown()`` — sessions are
owned by the caller (driver, bench.py, or the pytest fixture).
"""

__version__ = "0.1.0"
