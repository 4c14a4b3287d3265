"""Does the NEAR-cohort candidate budget fail on far (OOD) queries?

Measures end recall@10 of the scan engine on query cohorts jittered at
1x / 2x / 3x each row's true NN distance, at several top_c values
(the near-derived budget, the far-derived budget, and steps between).
Decides whether the two-cohort max in derive_candidate_budget is worth
its QPS cost (VERDICT r2 weak #6).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from cphnsw_tpu.api.scan_index import ScanIndex
from cphnsw_tpu.search import scan
from cphnsw_tpu.utils.datasets import make_synthetic

ds = make_synthetic("synthetic-100k-128d", n_queries=16)
base = ds["base"]
n, dim = base.shape

idx = ScanIndex(dim, bits=1).build(base).finalize(verbose=True)
arr = idx._arrays
print("stored (two-cohort max) ranks:", idx._budget.ranks.tolist(),
      flush=True)

rng = np.random.default_rng(7)
m = 512
ids = rng.choice(n, size=m, replace=False)
rows = base[ids]
d = np.stack([((r - base) ** 2).sum(-1) for r in rows])
d[np.arange(m), ids] = np.inf
nn = np.sqrt(d.min(1))

aff_a, aff_b, n_dev = idx._dev_scalars
n_pad = arr.raw.shape[0]

for scale in (1.0, 3.0):
    noise = rng.standard_normal((m, dim)).astype(np.float32) / np.sqrt(dim)
    q = rows + noise * (scale * nn[:, None]).astype(np.float32)
    gt_d = np.stack([((x - base) ** 2).sum(-1) for x in q])
    gt = np.argsort(gt_d, 1)[:, :10]
    line = [f"scale={scale}:"]
    for top_c in (160, 368):
        chunk, n_eq, rem = scan.chunk_plan(n_pad, m)
        ids_d, _ = scan.scan_search(
            arr, jnp.asarray(q), idx._signs, aff_a, aff_b, n_dev,
            kappa=1.0, k=10, top_c=top_c, chunk=chunk, n_eq=n_eq, rem=rem,
        )
        got = np.asarray(ids_d)
        rec = (got[:, :, None] == gt[:, None, :]).any(-1).mean()
        line.append(f"tc={top_c}:{rec:.4f}")
    print("  ".join(line), flush=True)

# QPS at the two candidate budgets (Q=1024)
q1024 = np.repeat(rows, 2, axis=0)[:1024]
for top_c in (160, 368):
    chunk, n_eq, rem = scan.chunk_plan(n_pad, 1024)
    args = (arr, jnp.asarray(q1024), idx._signs, aff_a, aff_b, n_dev)
    kw = dict(kappa=1.0, k=10, top_c=top_c, chunk=chunk, n_eq=n_eq, rem=rem)
    scan.scan_search(*args, **kw)[0].block_until_ready()
    t0 = time.perf_counter()
    scan.scan_search(*args, **kw)[0].block_until_ready()
    dt = time.perf_counter() - t0
    print(f"top_c={top_c}: {1024 / dt:.0f} qps", flush=True)
