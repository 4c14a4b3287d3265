"""Sweep SEARCH_SUB_BATCH x CHUNK_ELEMENTS at the serving batch (Q=8192).

Build once, save to /tmp for reuse; patch module constants per config and
re-measure e2e search_batch wall time + recall.
"""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).parent.parent))
import numpy as np
import cphnsw_tpu.api.scan_index as si
import cphnsw_tpu.search.scan as scan
from cphnsw_tpu.utils.datasets import make_synthetic
from cphnsw_tpu.utils.eval import recall_at_k

n, dim, k = 100_000, 128, 10
ds = make_synthetic("synthetic-100k-128d", n_queries=8192)
base, queries, gt = ds["base"], ds["queries"], ds["groundtruth"]
save = Path("/tmp/scan100k.npz")
idx = si.ScanIndex(dim, bits=1)
if save.exists():
    idx.load(save)
else:
    idx.build(base).finalize()
    idx.save(save)
print("index ready", flush=True)

def measure(nq):
    q = queries[:nq]
    idx.search_batch(q, k=k)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter(); ids, _ = idx.search_batch(q, k=k)
        ts.append(time.perf_counter() - t0)
    med = float(np.median(ts))
    r = recall_at_k(np.asarray(ids), gt[:nq].astype(np.int64), k)
    return nq / med, med * 1e3, r

for sub in (2048, 4096, 8192):
    for ce_log in (28, 29):
        si.SEARCH_SUB_BATCH = sub
        scan.CHUNK_ELEMENTS = 1 << ce_log
        qps, ms, r = measure(8192)
        print(f"sub={sub:5d} chunk_elems=2^{ce_log}: {qps:8.0f} qps "
              f"({ms:6.1f} ms) recall={r:.4f}", flush=True)
