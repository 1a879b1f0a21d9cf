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

def _use_hash_shuffle() -> None:
    """Engine-wide default: hash-shuffle strategy for groupby/aggregate
    exchanges (Ray 2.49 defaults to sort-based). Sort-based groupbys
    SAMPLE their input by truncating upstream execution, which (a)
    re-executes the whole upstream a second time and (b) previously
    forced a full materialize barrier between the OCR hash-join and
    the reassembly groupby. Hash shuffle needs no sampling, so the
    streaming pipeline runs join -> groupby in one pass. Explicit
    ``Dataset.sort`` ops are unaffected."""
    from ray.data.context import DataContext, ShuffleStrategy

    ctx = DataContext.get_current()
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    # Ray's defaults (200 partitions, up to 64 aggregator actors, 1 CPU
    # each) reserve more CPUs than small clusters HAVE — the shuffle
    # operator then deadlocks against the OCR actor pool (observed at
    # num_cpus=4: 'Shuffle(num_partitions=200)' demanding 16 CPUs).
    # Cap the defaults to a small fraction; pipelines pass explicit
    # num_partitions on their groupbys where the data size warrants.
    ctx.default_hash_shuffle_parallelism = 32
    ctx.max_hash_shuffle_aggregators = 8
    ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = 0.05
    ctx.hash_aggregate_operator_actor_num_cpus_per_partition_override = 0.05
    # join aggregators default to 0.125 CPU/partition — a 16-partition
    # join demands 2 whole CPUs, which deadlocks a 4-CPU cluster whose
    # slots are already held by the (backpressured) OCR pool
    ctx.join_operator_actor_num_cpus_per_partition_override = 0.05


_use_hash_shuffle()

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
from .png import decode_png, encode_png  # noqa: F401
from .recognize import Recognizer  # noqa: F401
from .functions import (  # noqa: F401
    corpus,
    dedup,
    merge,
    multimodal,
    quality,
    relational,
    similarity,
    textstats,
)
