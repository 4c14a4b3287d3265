"""End-to-end ScanIndex measurement on real TPU: build, recall, QPS."""

import sys
import time

sys.path.insert(0, "/root/repo")

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
DIM = int(sys.argv[2]) if len(sys.argv) > 2 else 128
BITS = [int(b) for b in (sys.argv[3].split(",") if len(sys.argv) > 3 else ["1", "2", "4"])]
Q = int(sys.argv[4]) if len(sys.argv) > 4 else 8192

import numpy as np
from cphnsw_tpu.api.scan_index import ScanIndex
from cphnsw_tpu.utils.datasets import make_synthetic

K = 10
name = f"synthetic-{N // 1000}k-{DIM}d" if N < 1_000_000 else f"synthetic-{N // 1_000_000}m-{DIM}d"
ds = make_synthetic(name, n_queries=Q)
base, queries, gt = ds["base"], ds["queries"], ds["groundtruth"]
print(f"dataset ready n={len(base)} q={len(queries)}", flush=True)

for bits in BITS:
    t0 = time.time()
    idx = ScanIndex(DIM, bits=bits).build(base).finalize(verbose=True)
    build_s = time.time() - t0
    print(f"bits={bits} build={build_s:.1f}s", flush=True)
    ids, d = idx.search_batch(queries, k=K)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        ids, d = idx.search_batch(queries, k=K)
        ts.append(time.perf_counter() - t0)
    qps = Q / min(ts)
    rec = (ids[:, :, None] == gt[:, None, :K]).any(-1).mean()
    print(
        f"bits={bits} N={N}: recall@10={rec:.4f} QPS={qps:.0f} "
        f"t={min(ts)*1e3:.1f}ms build={build_s:.1f}s",
        flush=True,
    )
