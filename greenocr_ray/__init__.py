"""greenocr_ray — Ray-Data-native interleaved text+media extraction
engine (from-scratch reimplementation of martinEst/GreenOCR's
capabilities as a web-scale document pipeline).

Public surface:

- ``run_sharded_extraction`` / ``ShardedOptions`` — the zero-shuffle
  co-partitioned fast path (media stored in document order);
- ``run_extraction`` / ``extract_dataset`` / ``ExtractOptions`` — the
  general streaming pipeline (hash-joins recognized text onto spans,
  works for any media layout);
- ``SpanPipeline`` — the stage-chaining extension surface;
- ``Recognizer`` — the deterministic glyph-template OCR model;
- ``kernels`` — the pure-numpy image kernel library.

All pipelines are resumable (partition-granular lineage) and verified
by span-sequence equality on (kind, text, media_ref, order).
"""

from . import kernels  # noqa: F401
from .pipelines.builder import SpanPipeline  # noqa: F401
from .pipelines.extract import (  # noqa: F401
    ExtractOptions,
    extract_dataset,
    extract_flat,
    run_extraction,
)
from .pipelines.sharded import (  # noqa: F401
    ShardedOptions,
    plan_shards,
    run_sharded_extraction,
)
from .recognize import Recognizer  # noqa: F401
