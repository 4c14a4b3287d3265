"""Measure the graph-free full-DB MXU scan (QPS + recall) on real TPU.

The TPU-first question: at bench scales (100k-1M), does one int-matmul
scan of all N codes + calibrated rerank beat graph traversal outright?
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from cphnsw_tpu.search import bruteforce
from cphnsw_tpu.utils.datasets import make_synthetic

N, DIM, Q, K = 100_000, 128, 1024, 10
ds = make_synthetic(f"synthetic-{N // 1000}k-{DIM}d", n_queries=Q)
base, queries, gt = ds["base"], ds["queries"], ds["groundtruth"]

for bits in (1, 2):
    t0 = time.time()
    idx = bruteforce.BruteForceIndex(DIM, bits=bits).build(base)
    print(f"bits={bits} build: {time.time()-t0:.1f}s", flush=True)
    for top_c in (100, 200, 400):
        ids, d = idx.search_batch(queries, k=K, top_c=top_c)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            ids, d = idx.search_batch(queries, k=K, top_c=top_c)
            ts.append(time.perf_counter() - t0)
        qps = Q / min(ts)
        rec = (ids[:, :, None] == gt[:, None, :K]).any(-1).mean()
        print(
            f"bits={bits} top_c={top_c}: recall@10={rec:.4f} "
            f"QPS={qps:.0f}",
            flush=True,
        )
