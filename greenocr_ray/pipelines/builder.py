"""The engine's deliberate user-extension surface (SURVEY.md §2.7).

The reference's "extension model" was copy-pasting whole scripts
(ENHANCMENT24.py ≡ preprocessEnchcnV1.py). Here the entire plugin API
is one protocol plus one builder:

- a **stage** is either a plain function ``fn(batch: pa.Table) ->
  pa.Table`` (stateless; runs as a task pool) or a callable CLASS
  whose instances do the same (stateful; runs as an actor pool with
  ``concurrency`` — setup in ``__init__`` once per actor);
- ``SpanPipeline`` chains stages into consecutive ``map_batches``
  calls over zero-copy Arrow batches, preserving Ray Data's streaming
  execution (lazy until consumed, backpressure intact).

    pipe = (SpanPipeline()
            .stage(clean_text_spans)
            .stage(OcrActor, concurrency=(2, 8), batch_size=32,
                   constructor_kwargs={"binarization": "sauvola"}))
    out = pipe.apply(documents_dataset)
"""

from __future__ import annotations

import inspect
from dataclasses import dataclass, field
from typing import Any, Callable

import ray.data as rd


@dataclass
class _StageSpec:
    fn: Callable
    batch_size: int | None = None
    concurrency: int | tuple[int, int] | None = None
    num_cpus: float | None = None
    constructor_kwargs: dict[str, Any] = field(default_factory=dict)
    batch_format: str = "pyarrow"


class SpanPipeline:
    """Composable chain of span-batch stages -> one streaming Dataset
    pipeline. Immutable-ish: ``stage`` returns self for chaining."""

    def __init__(self) -> None:
        self._stages: list[_StageSpec] = []

    def stage(
        self,
        fn: Callable,
        *,
        batch_size: int | None = None,
        concurrency: int | tuple[int, int] | None = None,
        num_cpus: float | None = None,
        constructor_kwargs: dict[str, Any] | None = None,
        batch_format: str = "pyarrow",
    ) -> "SpanPipeline":
        """Append a stage. Classes become actor pools (``concurrency``
        defaults to a small autoscaling pool); functions become task
        pools, where ``concurrency`` caps concurrent tasks."""
        is_cls = inspect.isclass(fn)
        if is_cls and concurrency is None:
            concurrency = (1, 4)
        if not is_cls and constructor_kwargs:
            raise ValueError("constructor_kwargs only apply to class stages")
        self._stages.append(
            _StageSpec(
                fn=fn,
                batch_size=batch_size,
                concurrency=concurrency,
                num_cpus=num_cpus,
                constructor_kwargs=dict(constructor_kwargs or {}),
                batch_format=batch_format,
            )
        )
        return self

    def apply(self, ds: rd.Dataset) -> rd.Dataset:
        """Lazily chain the stages onto ``ds`` (no execution here)."""
        for s in self._stages:
            kwargs: dict[str, Any] = {
                "batch_format": s.batch_format,
            }
            if s.batch_size is not None:
                kwargs["batch_size"] = s.batch_size
            if s.num_cpus is not None:
                kwargs["num_cpus"] = s.num_cpus
            # concurrency applies to BOTH stage kinds: actor-pool size
            # for classes, max concurrent tasks for plain functions
            if s.concurrency is not None:
                kwargs["concurrency"] = s.concurrency
            if inspect.isclass(s.fn):
                if s.constructor_kwargs:
                    kwargs["fn_constructor_kwargs"] = s.constructor_kwargs
            ds = ds.map_batches(s.fn, **kwargs)
        return ds

    def __len__(self) -> int:
        return len(self._stages)
