"""SpanPipeline builder — the §2.7 extension surface.

Stage fns are defined INSIDE the tests: module-level functions in a
test file pickle by reference and Ray workers cannot import the test
module; closures pickle by value.
"""

from __future__ import annotations

import pyarrow as pa
import pytest
import ray.data as rd

from greenocr_ray.pipelines.builder import SpanPipeline


def _make_double():
    def double(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.set_column(0, "v", pc.multiply(t.column("v"), 2))

    return double


def test_chains_function_and_actor_stages(ray_session):
    ds = rd.from_arrow(pa.table({"v": list(range(10))}))

    offset = 5

    class AddOffsetLocal:
        def __init__(self, offset: int = 0):
            self.offset = offset

        def __call__(self, t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return t.set_column(0, "v", pc.add(t.column("v"), self.offset))

    pipe = (
        SpanPipeline()
        .stage(_make_double())
        .stage(
            AddOffsetLocal,
            concurrency=(1, 2),
            constructor_kwargs={"offset": offset},
        )
    )
    assert len(pipe) == 2
    out = sorted(r["v"] for r in pipe.apply(ds).take_all())
    assert out == [2 * v + offset for v in range(10)]


def test_lazy_until_consumed(ray_session):
    ds = rd.from_arrow(pa.table({"v": [1]}))
    pipe = SpanPipeline().stage(_make_double())
    chained = pipe.apply(ds)  # must not execute
    assert isinstance(chained, rd.Dataset)


def test_constructor_kwargs_rejected_for_functions():
    with pytest.raises(ValueError, match="constructor_kwargs"):
        SpanPipeline().stage(_make_double(), constructor_kwargs={"x": 1})
