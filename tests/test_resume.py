import json
import os
import shutil

import pyarrow.parquet as pq

from greenocr_ray.fixtures.gen import write_corpus
from greenocr_ray.pipelines.extract import ExtractOptions, run_extraction
from greenocr_ray.state.lineage import completed_partitions, read_lineage


def _read_all_parts(out_dir):
    rows = {}
    for f in sorted(os.listdir(out_dir)):
        if f.startswith("part-") and f.endswith(".parquet"):
            t = pq.read_table(os.path.join(out_dir, f))
            for i in range(t.num_rows):
                rows[t.column("doc_id")[i].as_py()] = [
                    (s["kind"], s["text"], s["media_ref"], s["offset"])
                    for s in t.column("spans")[i].as_py()
                ]
    return rows


def test_checkpoint_resume_no_duplicates(tmp_path):
    data_dir = str(tmp_path / "data")
    paths = write_corpus(data_dir, n_docs=20, seed=31)
    opts = ExtractOptions(n_parts=4, join_partitions=2, ocr_concurrency=(1, 2))

    out_a = str(tmp_path / "run_a")
    lin_a = run_extraction(paths["documents"], paths["media"], out_a, opts)
    assert sorted(lin_a["partition_id"]) == [0, 1, 2, 3]
    assert (lin_a["status"] == "done").all()
    golden = _read_all_parts(out_a)
    assert len(golden) == 20

    # simulate a crash after 2 partitions: copy output, delete 2
    # partitions' data+lineage
    out_b = str(tmp_path / "run_b")
    shutil.copytree(out_a, out_b)
    for pid in (1, 3):
        os.remove(os.path.join(out_b, f"part-{pid:05d}.parquet"))
        os.remove(os.path.join(out_b, "_lineage", f"part-{pid:05d}.json"))
    assert completed_partitions(out_b) == {0, 2}

    lin_b = run_extraction(paths["documents"], paths["media"], out_b, opts)
    # only the missing partitions were re-processed
    assert sorted(lin_b["partition_id"]) == [1, 3]
    # final output identical to the uninterrupted run, no duplicates
    resumed = _read_all_parts(out_b)
    assert resumed == golden
    assert completed_partitions(out_b) == {0, 1, 2, 3}
    lineage = read_lineage(out_b)
    assert len(lineage) == 4
    assert lineage["n_docs"].sum() == 20


def test_resume_low_completion_skips_media_filter(tmp_path, monkeypatch):
    """A crash at ~12% completion resumes through the no-filter regime
    (building a needed-ref set there would be corpus-sized) and still
    produces the identical final table."""
    import greenocr_ray.pipelines.extract as X

    data_dir = str(tmp_path / "data")
    paths = write_corpus(data_dir, n_docs=24, seed=33)
    opts = ExtractOptions(n_parts=8, join_partitions=2, ocr_concurrency=(1, 2))

    out_a = str(tmp_path / "run_a")
    run_extraction(paths["documents"], paths["media"], out_a, opts)
    golden = _read_all_parts(out_a)

    out_b = str(tmp_path / "run_b")
    shutil.copytree(out_a, out_b)
    for pid in range(1, 8):  # keep only partition 0 -> done fraction 1/8
        os.remove(os.path.join(out_b, f"part-{pid:05d}.parquet"))
        os.remove(os.path.join(out_b, "_lineage", f"part-{pid:05d}.json"))

    calls = []
    orig = X._needed_media_refs
    monkeypatch.setattr(X, "_needed_media_refs", lambda d: calls.append(1) or orig(d))
    lin = run_extraction(paths["documents"], paths["media"], out_b, opts)
    assert calls == []  # below _MIN_DONE_FRACTION: no needed-ref pass at all
    assert sorted(lin["partition_id"]) == list(range(1, 8))
    assert _read_all_parts(out_b) == golden


def test_resume_semi_join_regime(tmp_path, monkeypatch):
    """Forcing the broadcast limit to zero routes the mostly-done
    resume through the distributed semi-join; output is unchanged."""
    import greenocr_ray.pipelines.extract as X

    monkeypatch.setattr(X, "_BROADCAST_REF_LIMIT", 0)
    data_dir = str(tmp_path / "data")
    paths = write_corpus(data_dir, n_docs=16, seed=34)
    opts = ExtractOptions(n_parts=4, join_partitions=2, ocr_concurrency=(1, 2))

    out_a = str(tmp_path / "run_a")
    run_extraction(paths["documents"], paths["media"], out_a, opts)
    golden = _read_all_parts(out_a)

    out_b = str(tmp_path / "run_b")
    shutil.copytree(out_a, out_b)
    os.remove(os.path.join(out_b, "part-00002.parquet"))
    os.remove(os.path.join(out_b, "_lineage", "part-00002.json"))
    lin = run_extraction(paths["documents"], paths["media"], out_b, opts)
    assert sorted(lin["partition_id"]) == [2]
    assert _read_all_parts(out_b) == golden


def test_lineage_record_fields(tmp_path):
    data_dir = str(tmp_path / "data")
    paths = write_corpus(data_dir, n_docs=6, seed=32)
    out = str(tmp_path / "out")
    run_extraction(
        paths["documents"],
        paths["media"],
        out,
        ExtractOptions(n_parts=2, join_partitions=2, ocr_concurrency=(1, 2)),
    )
    with open(os.path.join(out, "_lineage", "part-00000.json")) as fh:
        rec = json.load(fh)
    for field in (
        "partition_id",
        "n_docs",
        "n_spans",
        "n_media",
        "wall_ms",
        "spans_per_sec",
        "mean_confidence",
        "status",
    ):
        assert field in rec


def test_semi_join_preserves_types_and_null_dims(ray_session):
    """The distributed semi-join must rebuild media rows with their
    original Arrow types (int32 dims, binary payloads) and keep a
    tolerated null-dim row as a typed null instead of raising
    ArrowInvalid on the pandas NaN (ADVICE r2 item 3)."""
    import pyarrow as pa
    import ray.data as rd

    from greenocr_ray.pipelines.extract import _semi_join_media

    media_t = pa.table(
        {
            "media_ref": ["m0", "m1", "m2", "m3"],
            "width": pa.array([10, None, 12, 13], type=pa.int32()),
            "height": pa.array([4, 5, None, 7], type=pa.int32()),
            "pixels": pa.array(
                [b"\x00" * 40, None, b"\x02" * 48, b"\x03" * 91],
                type=pa.binary(),
            ),
        }
    )
    media = rd.from_arrow(media_t)
    needed = rd.from_arrow(
        pa.table({"media_ref": pa.array(["m0", "m1", "m2"])})
    )
    out = _semi_join_media(media, needed, nbuckets=2).to_arrow_refs()
    import ray

    got = pa.concat_tables(
        [t for t in ray.get(out) if t.num_rows], promote_options="default"
    ).sort_by("media_ref")
    assert got.schema.field("width").type == pa.int32()
    assert got.schema.field("height").type == pa.int32()
    assert got.schema.field("pixels").type == pa.binary()
    assert got.column("media_ref").to_pylist() == ["m0", "m1", "m2"]
    assert got.column("width").to_pylist() == [10, None, 12]
    assert got.column("pixels").to_pylist()[1] is None


def test_fresh_run_is_one_streaming_plan(tmp_path, monkeypatch):
    """The checkpointed path must stream end-to-end: a fresh
    run_extraction never calls Dataset.materialize (the round-3
    barrier), relying on typed part_id sentinels instead."""
    import ray.data as rd

    data_dir = str(tmp_path / "data")
    paths = write_corpus(data_dir, n_docs=12, seed=5)
    # plan_barrier=False forces the streaming shape (the adaptive
    # default resolves to the barrier on this single-node test cluster)
    opts = ExtractOptions(
        n_parts=4,
        join_partitions=2,
        ocr_concurrency=(1, 2),
        plan_barrier=False,
    )

    calls = []
    orig = rd.Dataset.materialize

    def spy(self, *a, **kw):
        calls.append(1)
        return orig(self, *a, **kw)

    monkeypatch.setattr(rd.Dataset, "materialize", spy)
    out = str(tmp_path / "run")
    lin = run_extraction(paths["documents"], paths["media"], out, opts)
    assert calls == [], "materialize barrier reappeared in run_extraction"
    assert (lin["status"] == "done").all()
    assert len(_read_all_parts(out)) == 12


def test_plan_barrier_adaptive_default(ray_session):
    """On this single-node test cluster the adaptive default resolves
    to the barrier plan (multi-node resolves to streaming)."""
    from greenocr_ray.pipelines.extract import _single_node_cluster

    assert _single_node_cluster() is True
    assert ExtractOptions().plan_barrier is None
