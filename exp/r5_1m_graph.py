"""Round-5: 1M/128d graph-engine measurement (VERDICT r4 item 4).

Builds the 1M 1-bit graph index (exercising the force() HBM throttles
on the real chip), saves it, then measures QPS/recall at Q in {1024,
8192} and k in {10, 100} — the round-4 number (68 QPS @ Q=1000) ran the
serial while_loop at a batch too small to amortize its lockstep steps.

Usage: python exp/r5_1m_graph.py [--load]
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

from cphnsw_tpu.api.index import Index
from cphnsw_tpu.utils.datasets import make_synthetic
from cphnsw_tpu.utils.eval import recall_at_k

IDX_FILE = Path("/tmp/idx1m_graph_1bit.npz")


def med(fn, reps=3):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def main():
    n, dim, bits = 1_000_000, 128, 1
    ds = make_synthetic("synthetic-1m-128d", n_queries=8192)
    queries, gt = ds["queries"], ds["groundtruth"]
    gt = gt.astype(np.int64)

    idx = Index(dim, bits=bits)
    if "--load" in sys.argv and IDX_FILE.exists():
        t0 = time.perf_counter()
        idx.load(IDX_FILE)
        print(f"load {time.perf_counter() - t0:.1f}s", flush=True)
    else:
        base = ds["base"]
        t0 = time.perf_counter()
        idx.build(base)
        idx.finalize(verbose=True)
        print(f"build {time.perf_counter() - t0:.1f}s "
              f"stages={getattr(idx, 'build_stages', None)}", flush=True)
        try:
            idx.save(IDX_FILE)
            print("saved", flush=True)
        except Exception as e:
            print("save failed:", e, flush=True)
    print(f"step budget: {idx._step_budget}", flush=True)

    out = {"n": n, "dim": dim, "bits": bits,
           "step_budget": idx._step_budget, "cases": {}}
    for nq in (2048, 4096):
        for k in (10, 100):
            q = queries[:nq]
            ms = med(lambda: idx.search_batch(q, k=k))
            ids, _ = idx.search_batch(q, k=k)
            r10 = recall_at_k(np.asarray(ids), gt[:nq], 10)
            rk = recall_at_k(np.asarray(ids), gt[:nq], min(k, 100))
            case = {"ms": round(ms, 1), "qps": round(nq / (ms / 1e3)),
                    "recall10": round(r10, 4), f"recall{k}": round(rk, 4)}
            out["cases"][f"q{nq}_k{k}"] = case
            print(f"Q={nq} k={k}: {case}", flush=True)

    res = Path(__file__).parent.parent / "results"
    fn = res / "r5_1m_graph.json"
    fn.write_text(json.dumps(out, indent=1))
    print(f"wrote {fn}", flush=True)


if __name__ == "__main__":
    main()
