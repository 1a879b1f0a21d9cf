"""Benchmark harness.

Plain run: one Ray session at ``num_cpus=$RAY_GRAFT_CPUS`` (default 32)
over ``$GRAFT_SF_DIR`` (default /root/testdata/sf0.1); prints ONE JSON
line: {"metric", "value" (headline extraction seconds), "unit",
"queries" (per-query seconds), "sf", "num_cpus", "docs_per_sec", ...}.

``--scaling``: runs the headline pipeline twice in fresh subprocesses
at num_cpus=4 and num_cpus=16 on the same input (the sandbox stand-in
for the N / 4N node clusters of the north rule; see the leg-choice
comment in scaling_main) and prints throughput at both plus scaling
efficiency = (t_lo / t_hi) / 4.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time


def scaling_main() -> None:
    def run(ncpu: int) -> dict:
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            # scaling legs: headline + streaming pipelines, no query
            # micro-timings, on a 4x corpus — Ray's actor-pool
            # spin-up/drain is a fixed ~2.5s per execution, so the
            # per-leg work must dwarf it for the efficiency ratio to
            # reflect the pipeline, not the harness
            GRAFT_BENCH_SCALING="1",
            # 8x corpus (40k docs): per-leg work must dwarf Ray's fixed
            # ~5s pipeline overhead or the efficiency ratio measures the
            # harness — at 4x the faster OCR kernel left the 16/32-cpu
            # legs fixed-cost- and bandwidth-dominated
            GRAFT_BENCH_REPEAT=os.environ.get("GRAFT_SCALING_REPEAT", "8"),
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    # Both leg pairs run and report. 4->16 stays below this single
    # box's memory-bandwidth saturation point (the pair the rule is
    # judged on, as the sandbox stand-in for N->4N NODES); at 8->32
    # the high leg saturates the socket and per-shard compute inflates
    # ~1.3x — an artifact a real N->4N NODE cluster (constant per-node
    # density) does not exhibit. Reporting both keeps the saturated
    # pair visible instead of selected away.
    #
    # GRAFT_SCALING_ABBA=1 runs the judged pair in ABBA order
    # (4,16,16,4) and averages each leg's two runs: this box's
    # throughput drifts over hours (identical code measured 1.5x
    # apart), and a sequential lo-then-hi order converts linear drift
    # straight into efficiency bias; ABBA cancels the linear term.
    if os.environ.get("GRAFT_SCALING_ABBA") == "1":
        order = [4, 16, 16, 4]
    else:
        order = [4, 16, 8, 32]
    raw: dict[int, list[dict]] = {}
    for n in order:
        raw.setdefault(n, []).append(run(n))

    def avg(n: int) -> dict:
        rs = raw[n]
        keys = ("value", "docs_per_sec", "streaming_sec")
        out = dict(rs[0])
        for k in keys:
            if all(k in r for r in rs):
                out[k] = round(sum(r[k] for r in rs) / len(rs), 3)
        return out

    results = {n: avg(n) for n in raw}

    def pair(lo: int, hi: int) -> dict:
        r_lo, r_hi = results[lo], results[hi]
        out = {
            "cpus_lo": lo,
            "cpus_hi": hi,
            "sec_lo": r_lo["value"],
            "sec_hi": r_hi["value"],
            "docs_per_sec_lo": r_lo["docs_per_sec"],
            "docs_per_sec_hi": r_hi["docs_per_sec"],
            "scaling_efficiency": round(
                (r_lo["value"] / r_hi["value"]) / (hi / lo), 3
            ),
        }
        if "streaming_sec" in r_lo and "streaming_sec" in r_hi:
            out["streaming_sec_lo"] = r_lo["streaming_sec"]
            out["streaming_sec_hi"] = r_hi["streaming_sec"]
            out["streaming_scaling_efficiency"] = round(
                (r_lo["streaming_sec"] / r_hi["streaming_sec"]) / (hi / lo), 3
            )
        return out

    p_unsat = pair(4, 16)
    pairs = [p_unsat]
    if 32 in results:
        pairs.append(pair(8, 32))
    any_leg = results[max(results)]
    print(
        json.dumps(
            {
                # primary (unsaturated) pair at the top level for
                # compatibility with earlier records
                **p_unsat,
                "pairs": pairs,
                "abba": os.environ.get("GRAFT_SCALING_ABBA") == "1",
                "n_docs": any_leg["n_docs"],
                "sf": any_leg["sf"],
            }
        )
    )


def main() -> None:
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    repeat = int(os.environ.get("GRAFT_BENCH_REPEAT", "1"))
    headline_only = os.environ.get("GRAFT_BENCH_HEADLINE_ONLY") == "1"
    scaling_leg = os.environ.get("GRAFT_BENCH_SCALING") == "1"  # no queries

    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    import hashlib

    import pyarrow.parquet as pq
    import ray.data as rd

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from greenocr_ray.pipelines.extract import ExtractOptions, run_extraction
    from greenocr_ray.pipelines.interleave import build_interleaved
    from greenocr_ray.pipelines.sharded import ShardedOptions, run_sharded_extraction

    # ---- untimed prep: derive the interleaved corpus (cached in /tmp)
    tag = hashlib.md5(f"{sf_dir}|bench-v3|r{repeat}".encode()).hexdigest()[:10]
    corpus_dir = f"/tmp/greenocr_bench/{tag}"
    paths = build_interleaved(sf_dir, corpus_dir, repeat=repeat)
    n_docs = pq.read_table(paths["documents"], columns=["doc_id"]).num_rows
    # warm the page cache (+ Ray worker prestart) so the timed run
    # measures compute + exchange, not cold I/O. A bare .count() is a
    # no-op (Ray answers it from parquet footers); the map_batches
    # forces every block through a real read task.
    import pyarrow as _pa

    rd.read_parquet(paths["media"]).map_batches(
        lambda t: _pa.table({"n": [t.num_rows]}), batch_format="pyarrow"
    ).count()
    # untimed COMPUTE warm-up: the first run after idle measures up to
    # ~1.5x slower on this box (frequency ramp + cold worker pools);
    # OCR a small payload slice through a real actor pool so the timed
    # run reflects steady state
    from greenocr_ray.stages.ocr import OcrMediaActor

    # pool floor MUST stay below num_cpus: a floor equal to the
    # cluster size reserves every CPU and starves the upstream read
    # tasks (observed deadlock on the 4-cpu scaling leg)
    rd.read_parquet(paths["media"]).limit(768).map_batches(
        OcrMediaActor,
        batch_format="pyarrow",
        batch_size=32,
        concurrency=(max(1, min(2, num_cpus - 2)), num_cpus),
        num_cpus=1,
    ).count()

    # ---- headline: co-partitioned shard extraction (zero-shuffle
    # fast path; the layout build_interleaved produces), checkpointed
    out_dir = f"/tmp/greenocr_bench/out_{num_cpus}"
    shutil.rmtree(out_dir, ignore_errors=True)
    # fixed pool at 3/4 of the CPUs: headroom for dataset machinery,
    # and the SAME cluster fraction at every size so the N->4N legs
    # compare like for like (the shard specs are pre-materialized
    # items — no upstream read tasks to starve)
    sopts = ShardedOptions(concurrency=max(1, (num_cpus * 3) // 4))
    t0 = time.monotonic()
    lineage = run_sharded_extraction(
        paths["documents"], paths["media"], out_dir, sopts
    )
    headline = time.monotonic() - t0
    assert int(lineage["n_docs"].sum()) == n_docs, "bench output lost docs"

    # ---- secondary: the general streaming pipeline (hash-join path
    # for non-co-partitioned media layouts)
    streaming = None
    if not headline_only:
        out_dir2 = f"/tmp/greenocr_bench/outs_{num_cpus}"
        shutil.rmtree(out_dir2, ignore_errors=True)
        opts = ExtractOptions(
            # 16 shuffle partitions regardless of cpu count: every
            # extra hash-shuffle partition adds aggregator-actor fixed
            # cost; at this data size 32/32 ran 25-36s vs a stable
            # ~18s at 16/16 (real deployments size these to data, not
            # to cores)
            n_parts=16,
            join_partitions=16,
            # pool floor skips autoscaling ramp-up, but must stay below
            # num_cpus or the floor actors reserve every CPU and starve
            # the read tasks that feed them (observed deadlock at 8 cpus)
            ocr_concurrency=(min(8, max(1, num_cpus // 2)), num_cpus),
        )
        t0 = time.monotonic()
        lin2 = run_extraction(paths["documents"], paths["media"], out_dir2, opts)
        streaming = time.monotonic() - t0
        assert int(lin2["n_docs"].sum()) == n_docs, "streaming output lost docs"

    # ---- per-query timings over the raw testdata tables.
    # Drift-honest protocol (VERDICT r4 next-step #10): the full query
    # list runs GRAFT_QUERY_ROUNDS times in round-robin order (so slow
    # box intervals spread across queries instead of landing on one),
    # and each query reports its per-round MEDIAN. One recorded file
    # is then separable into real regressions vs box drift without
    # re-running the box.
    import __ray_entry__ as E

    qs = E.queries()
    timings: dict[str, float] = {}
    query_names = () if (headline_only or scaling_leg) else (
        "q1_pricing_summary",
        "events_hourly",
        "segment_revenue",
        "token_counts",
        "quality_scores",
        "dedup_exact",
        "minhash_pairs",
        "dup_ngram_stats",
        "simhash",
        "knn_cosine",
        "llm_prep",
        "collocations",
        "dedup_substrings",
    )
    n_rounds = int(os.environ.get("GRAFT_QUERY_ROUNDS", "3"))
    samples: dict[str, list[float]] = {n: [] for n in query_names}
    for _round in range(n_rounds if query_names else 0):
        for name in query_names:
            t0 = time.monotonic()
            res = qs[name](sf_dir)
            if hasattr(res, "iter_internal_ref_bundles"):  # lazy Dataset:
                res.count()  # force execution inside the timed region
            samples[name].append(time.monotonic() - t0)
    for name, ts in samples.items():
        ts.sort()
        timings[name] = round(ts[len(ts) // 2], 3)
    if not (headline_only or scaling_leg):

        def med_of(fn) -> float:
            ts = []
            for _ in range(n_rounds):
                t0 = time.monotonic()
                fn()
                ts.append(time.monotonic() - t0)
            ts.sort()
            return round(ts[len(ts) // 2], 3)

        # fingerprints: time the DISTRIBUTED pipeline alone; the
        # queries() entry also runs a driver-side recompute (the
        # machine gate), which is verification cost, not pipeline cost
        # — reported separately so it never reads as a regression
        import ray.data as _rd

        from greenocr_ray.functions.textstats import fingerprint as _fp

        timings["fingerprints"] = med_of(
            lambda: _rd.read_parquet(
                f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
            ).map_batches(_fp, batch_format="pyarrow").count()
        )
        timings["fingerprints_with_gate"] = med_of(
            lambda: qs["fingerprints"](sf_dir)
        )

        # semdedup: time the clustered pipeline alone — the queries()
        # entry also runs the exact all-pairs recompute (machine-gate
        # verification cost, not pipeline cost)
        from greenocr_ray.functions.similarity import semdedup_pairs as _sd

        timings["semdedup"] = med_of(
            lambda: _sd(
                _rd.read_parquet(
                    f"{sf_dir}/embeddings.parquet",
                    columns=["vec_id", "embedding"],
                ),
                k=4,
                threshold=0.4,
                probes=2,
            )
        )

    result = {
        "metric": "interleaved text+media extraction wall time (docs/sec in docs_per_sec)",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "n_docs": int(n_docs),
        "docs_per_sec": round(n_docs / headline, 2),
        "n_media": int(lineage["n_media"].sum()),
        # span-weighted: an unweighted mean over shards overweights
        # media-light tail shards
        "mean_confidence": round(
            float(
                (lineage["mean_confidence"] * lineage["n_spans"]).sum()
                / max(int(lineage["n_spans"].sum()), 1)
            ),
            4,
        ),
    }
    if streaming is not None:
        result["streaming_sec"] = round(streaming, 3)
        result["streaming_docs_per_sec"] = round(n_docs / streaming, 2)
    ray.shutdown()
    print(json.dumps(result))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling_main()
    else:
        main()
