"""Benchmark harness.

Runs the headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) under `ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS or 32)` and prints ONE JSON line:

    {"metric": ..., "value": total_sec, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
     "linkage_pages": P, "linkage_pages_per_sec": R}

`--scaling` runs the same job twice in FRESH processes (num_cpus=8 then
32) on identical input and reports both throughputs + scaling efficiency
(the sandbox stand-in for the N-node vs 4N-node cluster criterion).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

# benchmark fixture: ~96 comparable blocks (~100 mentions each) plus one
# hot block that forces salting; sized so per-block work dominates
# scheduling overhead at both parallelism levels
BENCH_SPEC = dict(n_names=48, persons_per_name=4, docs_per_person=25, hot_name_factor=3)
BENCH_FIXTURE_DIR = "/tmp/hgcn_ray_bench_fixture_v2"


def _bench_fixture_path() -> str:
    from hgcn_name_disambiguation_ray.fixtures import FixtureSpec, write_fixture

    marker = os.path.join(BENCH_FIXTURE_DIR, "pages.parquet")
    if not os.path.exists(marker):
        write_fixture(FixtureSpec(**BENCH_SPEC), BENCH_FIXTURE_DIR)
    return marker


def run_benchmarks() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import ray.data as rd
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    import numpy as np
    import pyarrow as pa

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __ray_entry__ as entrymod

    from hgcn_name_disambiguation_ray.config import LinkageConfig
    from hgcn_name_disambiguation_ray.pipelines.linkage import run_linkage

    pages_path = _bench_fixture_path()
    # warm the OS page cache so we measure compute + shuffle, not cold disk
    rd.read_parquet(pages_path).count()
    rd.read_parquet(os.path.join(SF_DIR, "lineitem.parquet")).count()

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    # --- headline 1: full record linkage over the pages fixture ---
    t0 = time.time()
    pages = rd.read_parquet(pages_path)
    n_pages = pages.count()
    clusters = run_linkage(pages, LinkageConfig(salt_cap=256))
    n_out = clusters.count()
    timings["linkage"] = time.time() - t0
    extras["linkage_pages"] = n_pages
    extras["linkage_pages_per_sec"] = round(n_pages / timings["linkage"], 1)
    assert n_out == n_pages

    # --- headline 2: lineitem scan + vectorized aggregate (column-pruned) ---
    t0 = time.time()
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    li = rd.read_parquet(
        os.path.join(SF_DIR, "lineitem.parquet"),
        columns=["l_returnflag", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def revenue(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        g = (
            t.append_column("revenue", rev)
            .group_by("l_returnflag")
            .aggregate([("l_quantity", "sum"), ("revenue", "sum")])
        )
        return g.rename_columns(["l_returnflag", "sum_qty", "sum_rev"])

    li.map_batches(revenue, batch_format="pyarrow").groupby("l_returnflag").aggregate(
        Sum("sum_qty", alias_name="sum_qty"), Sum("sum_rev", alias_name="sum_rev")
    ).to_pandas()
    timings["lineitem_agg"] = time.time() - t0

    # --- remaining headline queries from the driver battery ---
    qs = entrymod.queries()
    for name in ["cooccur_pairs", "minhash_dedup", "topk_cosine", "window_counts"]:
        t0 = time.time()
        res = qs[name](SF_DIR)
        if hasattr(res, "to_pandas"):
            res.to_pandas()
        timings[name] = time.time() - t0

    ray.shutdown()
    total = round(sum(timings.values()), 3)
    return {
        "metric": "headline pipelines wall time (linkage fixture + sf tables)",
        "value": total,
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        **extras,
    }


def run_scaling() -> None:
    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = run(8), run(32)
    t_lo, t_hi = lo["value"], hi["value"]
    eff = (t_lo / t_hi) / (32 / 8)
    print(
        json.dumps(
            {
                "metric": "scaling efficiency (8 -> 32 cpus, fresh processes)",
                "sec_8": t_lo,
                "sec_32": t_hi,
                "pages_per_sec_8": lo.get("linkage_pages_per_sec"),
                "pages_per_sec_32": hi.get("linkage_pages_per_sec"),
                "queries_8": lo.get("queries"),
                "queries_32": hi.get("queries"),
                "scaling_efficiency": round(eff, 3),
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    else:
        print(json.dumps(run_benchmarks()))
