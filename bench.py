"""Headline benchmark: QPS at recall@10 on synthetic SIFT-like data.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Engine: CPIndex auto-selection (the full-database MXU scan at this
scale).  The recorded operating point is the 8192-query serving batch —
the configuration a TPU chip actually runs in production, where the
fixed per-call costs (host->device query transfer over this
environment's ~20-40 MB/s tunnel, ~28 ms dispatch+fetch round trip)
amortize across the batch.  Small batches are round-trip-bound here:
the tunnel's RTT alone caps ANY Q=1024 engine near ~36k QPS regardless
of device speed (exp/scan_stage_table.py records the floor), so the
per-batch numbers at 1024 are reported alongside for transparency
rather than as the headline.

The reference publishes no numbers (BASELINE.md); vs_baseline compares
against a self-measured AVX2 reference run recorded in baseline_cpu.json
(produced by native/measure_reference.sh on this machine's CPU) when that
file exists, else 1.0.  The AVX2 run is the same full-query-set batch
workload (its OpenMP loop also amortizes per-batch costs), so the
comparison is batch-vs-batch.
"""

import json
import os
import time
from pathlib import Path

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", str(Path(__file__).parent / ".jax_cache")
)

import numpy as np


def timed_qps(index, queries, k, n_runs=5):
    index.search_batch(queries, k=k)  # warmup/compile
    times = []
    for _ in range(n_runs):
        t0 = time.perf_counter()
        ids, _ = index.search_batch(queries, k=k)
        times.append(time.perf_counter() - t0)
    med = float(np.median(times))
    return len(queries) / med, ids


def main():
    import jax

    from cphnsw_tpu.api.index import CPIndex
    from cphnsw_tpu.utils.datasets import make_synthetic
    from cphnsw_tpu.utils.eval import recall_at_k

    n, dim, k = 100_000, 128, 10
    ds = make_synthetic(f"synthetic-{n // 1000}k-{dim}d", n_queries=8192)
    base, queries, gt = ds["base"], ds["queries"], ds["groundtruth"]

    t0 = time.perf_counter()
    index = CPIndex(dim=dim, bits=1)
    index.build(base)
    index.finalize()
    build_s = time.perf_counter() - t0

    qps, ids = timed_qps(index, queries, k)
    r10 = recall_at_k(np.asarray(ids), gt.astype(np.int64), k)
    qps_small, ids_small = timed_qps(index, queries[:1024], k)
    r10_small = recall_at_k(
        np.asarray(ids_small), gt[:1024].astype(np.int64), k
    )

    baseline_file = Path(__file__).parent / "baseline_cpu.json"
    vs_baseline = 1.0
    ref_note = "no baseline_cpu.json"
    if baseline_file.exists():
        ref = json.loads(baseline_file.read_text())
        ref_qps = ref.get("qps_sift100k_1bit")
        ref_recall = ref.get("recall_at_10", 0.0)
        if ref_qps:
            vs_baseline = qps / ref_qps
            ref_note = (
                f"ref AVX2 1-core full-batch: {ref_qps:.0f} qps @ recall "
                f"{ref_recall:.3f} (fails the 0.95 recall bar; "
                f"raw-qps ratio shown)"
            )

    print(
        json.dumps(
            {
                "metric": "qps_at_recall10_synth100k_128d_1bit",
                # the operating point moved from Q=1024 to the Q=8192
                # serving batch in round 4; the explicit batch_size field
                # keeps longitudinal comparisons honest (ADVICE r4)
                "batch_size": 8192,
                "recall_at_10": round(float(r10), 4),
                "value": round(qps, 1),
                "unit": f"qps@8192q serving batch (recall@10={r10:.4f}; "
                f"qps@1024q={qps_small:.0f} @ recall "
                f"{r10_small:.4f}, tunnel-RTT-bound; "
                f"build={build_s:.1f}s, "
                f"engine={index.engine}, "
                f"device={jax.devices()[0].platform}; {ref_note})",
                "vs_baseline": round(vs_baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
