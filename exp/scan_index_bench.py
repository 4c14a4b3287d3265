"""Measure ScanIndex end-to-end on the real TPU: derived budget, QPS, recall.

Uses make_synthetic (the headline/baseline data) so numbers are comparable
with baseline_cpu.json and the round-1 records.

Usage: python exp/scan_index_bench.py [n] [dim] [bits...] [--q=Q] [--topc=a,b]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(args[0]) if args else 100_000
    dim = int(args[1]) if len(args) > 1 else 128
    bits_list = [int(b) for b in args[2:]] or [1, 2, 4]
    nq = 8192
    fixed_topc = []
    for a in sys.argv[1:]:
        if a.startswith("--q="):
            nq = int(a.split("=")[1])
        if a.startswith("--topc="):
            fixed_topc = [int(x) for x in a.split("=")[1].split(",")]

    from cphnsw_tpu import ScanIndex
    from cphnsw_tpu.utils.datasets import make_synthetic

    ds = make_synthetic(f"synthetic-{n // 1000}k-{dim}d", n_queries=nq)
    base, queries, gt = ds["base"], ds["queries"], ds["groundtruth"][:, :10]
    print(f"n={n} dim={dim} nq={len(queries)}", flush=True)
    assert gt.shape[1] == 10

    def timed(idx, queries, k, label):
        ids, _ = idx.search_batch(queries, k=k)  # compile + warmup
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            ids, _ = idx.search_batch(queries, k=k)
            times.append(time.perf_counter() - t0)
        med = float(np.median(times))
        recall = (ids[:, :, None] == gt[:, None, :]).any(-1).mean()
        print(
            f"{label}: recall@10={recall:.4f} qps={len(queries) / med:.0f} "
            f"med_batch={med * 1e3:.0f}ms",
            flush=True,
        )

    for bits in bits_list:
        t0 = time.perf_counter()
        idx = ScanIndex(dim, bits=bits).build(base).finalize(verbose=True)
        build_s = time.perf_counter() - t0
        print(f"bits={bits} build={build_s:.1f}s "
              f"top_c(10)={idx._budget.top_c(10, n)}", flush=True)
        timed(idx, queries, 10, f"bits={bits} derived")
        saved = idx._budget
        for tc in fixed_topc:
            import cphnsw_tpu.search.scan as scan
            idx._budget = scan.CandidateBudget(
                anchors=np.asarray([1, 10, 100], np.int64),
                ranks=np.asarray([tc, tc, tc], np.int64),
            )
            timed(idx, queries, 10, f"bits={bits} top_c={tc}")
        idx._budget = saved


if __name__ == "__main__":
    main()
