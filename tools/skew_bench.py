"""G1 skew microbench: heavy-tail media mix (wide page scans among
short line strips). Measures REAL per-batch OCR walls (the actor logs
each __call__ duration) with cost striping ON vs OFF, and end-to-end
extraction wall. Fresh Ray session per leg.

Usage: python tools/skew_bench.py [n_docs] [wide_fraction]
"""

from __future__ import annotations

import json
import subprocess
import sys
import tempfile
import textwrap

import numpy as np


def leg(cost_sort: bool, data_dir: str, walls_path: str) -> dict:
    code = textwrap.dedent(f"""
        import time, sys, json, os
        sys.path.insert(0, "/root/repo")
        import ray
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
        from ray.data import DataContext
        DataContext.get_current().enable_progress_bars = False
        import greenocr_ray.stages.ocr as O
        import pyarrow as pa

        class TimedOcr(O.OcrMediaActor):
            def __call__(self, batch):
                t0 = time.perf_counter()
                out = super().__call__(batch)
                with open("{walls_path}", "a") as fh:
                    fh.write(f"{{time.perf_counter() - t0}}\\n")
                return out

        import greenocr_ray.pipelines.extract as E
        E.OcrMediaActor = TimedOcr
        from greenocr_ray.sources.storage import read_table
        docs = read_table("{data_dir}/documents.parquet")
        media = read_table("{data_dir}/media.parquet")
        opts = E.ExtractOptions(cost_sort={cost_sort}, ocr_concurrency=(1, 8))
        t0 = time.perf_counter()
        n = E.extract_dataset(docs, media, opts).count()
        print("WALL", time.perf_counter() - t0, n)
        ray.shutdown()
    """)
    open(walls_path, "w").close()
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True
    )
    wall = None
    for ln in out.stdout.splitlines():
        if ln.startswith("WALL"):
            wall = float(ln.split()[1])
    if wall is None:
        raise RuntimeError(out.stderr[-2000:])
    walls = np.array(
        [float(x) for x in open(walls_path).read().split()], dtype=float
    )
    return {
        "wall": wall,
        "n_batches": len(walls),
        "batch_p50": float(np.percentile(walls, 50)),
        "batch_p95": float(np.percentile(walls, 95)),
        "batch_max": float(walls.max()),
    }


def batch_cost_stats(data_dir: str) -> dict:
    """Deterministic per-batch byte totals (cost proxy: corr(bytes,
    OCR wall) measured 0.97) striped vs natural, full windows only."""
    import pyarrow.parquet as pq

    from greenocr_ray.stages.ocr import cost_stripe_media

    media = pq.read_table(f"{data_dir}/media.parquet")
    nat = np.array([len(p) for p in media.column("pixels").to_pylist()])
    striped = cost_stripe_media(media, 32)
    stp = np.array([len(p) for p in striped.column("pixels").to_pylist()])

    def windows(c):
        full = len(c) // 32 * 32
        return c[:full].reshape(-1, 32).sum(axis=1)

    wn, ws = windows(nat), windows(stp)
    return {
        "natural_p95": int(np.percentile(wn, 95)),
        "striped_p95": int(np.percentile(ws, 95)),
        "natural_max": int(wn.max()),
        "striped_max": int(ws.max()),
        "p95_cost_improvement": float(np.percentile(wn, 95) / np.percentile(ws, 95)),
    }


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    wide = float(sys.argv[2]) if len(sys.argv) > 2 else 0.15
    sys.path.insert(0, "/root/repo")
    from greenocr_ray.fixtures.gen import write_corpus

    with tempfile.TemporaryDirectory() as d:
        write_corpus(d, n_docs=n_docs, seed=17, wide_fraction=wide)
        res = {}
        for name, flag in (("on", True), ("off", False), ("off2", False), ("on2", True)):
            res[name] = leg(flag, d, f"{d}/walls_{name}.txt")
        agg = {
            "on": {
                k: float(np.median([res["on"][k], res["on2"][k]]))
                for k in res["on"]
            },
            "off": {
                k: float(np.median([res["off"][k], res["off2"][k]]))
                for k in res["off"]
            },
        }
        agg["p95_wall_improvement"] = agg["off"]["batch_p95"] / agg["on"]["batch_p95"]
        agg["wall_ratio_off_over_on"] = agg["off"]["wall"] / agg["on"]["wall"]
        agg["deterministic_batch_cost"] = batch_cost_stats(d)
        print(json.dumps(agg, indent=2))


if __name__ == "__main__":
    main()
