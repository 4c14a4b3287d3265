"""Sweep smaller sub-batches and candidate-budget sensitivity at Q=8192."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).parent.parent))
import numpy as np
import cphnsw_tpu.api.scan_index as si
from cphnsw_tpu.utils.datasets import make_synthetic
from cphnsw_tpu.utils.eval import recall_at_k

n, dim, k = 100_000, 128, 10
ds = make_synthetic("synthetic-100k-128d", n_queries=8192)
queries, gt = ds["queries"], ds["groundtruth"]
idx = si.ScanIndex(dim, bits=1).load("/tmp/scan100k.npz")
print("loaded; budget ranks:", idx._budget.ranks.tolist(), flush=True)

def measure(nq):
    q = queries[:nq]
    idx.search_batch(q, k=k)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter(); ids, _ = idx.search_batch(q, k=k)
        ts.append(time.perf_counter() - t0)
    med = float(np.median(ts))
    return nq / med, med * 1e3, recall_at_k(np.asarray(ids), gt[:nq].astype(np.int64), k)

for sub in (512, 1024, 2048):
    si.SEARCH_SUB_BATCH = sub
    qps, ms, r = measure(8192)
    print(f"sub={sub:5d} top_c=auto: {qps:8.0f} qps ({ms:6.1f} ms) recall={r:.4f}", flush=True)

si.SEARCH_SUB_BATCH = 2048
import cphnsw_tpu.search.scan as scan
orig = idx._budget
for tc in (128, 192, 256, 320):
    idx._budget = scan.CandidateBudget(anchors=np.asarray([10]), ranks=np.asarray([tc]))
    qps, ms, r = measure(8192)
    print(f"sub=2048 top_c={tc}: {qps:8.0f} qps ({ms:6.1f} ms) recall={r:.4f}", flush=True)
idx._budget = orig
