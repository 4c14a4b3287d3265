"""8-shard virtual-mesh validation at realistic scale (VERDICT r3 weak #4:
'nothing says the 8-shard mesh hits recall 0.95 on a realistic partition').

Runs the sharded SCAN facade on a 100k x 128d clustered store over a
(2 data x 4 model) virtual CPU mesh and records recall@10 against exact
ground truth, plus agreement with the single-chip facade on the same
data.  Writes results/sharded_100k_cpu_mesh.json.
"""
import json
import os
import sys
import time
from pathlib import Path

os.environ.setdefault(
    "XLA_FLAGS",
    (os.environ.get("XLA_FLAGS", "")
     + " --xla_force_host_platform_device_count=8").strip(),
)
sys.path.insert(0, str(Path(__file__).parent.parent))
import jax

jax.config.update("jax_platforms", "cpu")
import numpy as np

from cphnsw_tpu.api.scan_index import ScanIndex
from cphnsw_tpu.parallel import sharded
from cphnsw_tpu.utils.datasets import make_synthetic
from cphnsw_tpu.utils.eval import recall_at_k


def main():
    ds = make_synthetic("synthetic-100k-128d", n_queries=1000)
    base, queries, gt = ds["base"], ds["queries"], ds["groundtruth"]
    mesh = sharded.make_mesh(2, 4)

    t0 = time.time()
    idx = sharded.ShardedScanIndex(128, bits=1).build(base, mesh)
    build_s = time.time() - t0
    t0 = time.time()
    ids, d = idx.search_batch(queries, k=10)
    search_s = time.time() - t0
    r10 = recall_at_k(np.asarray(ids), gt.astype(np.int64), 10)
    print(f"8-shard mesh: recall@10={r10:.4f} build={build_s:.0f}s "
          f"search({len(queries)}q)={search_s:.1f}s", flush=True)

    # agreement with the single-chip facade (same store, same wire dtype)
    idx.save("/tmp/sh100k.npz")
    single = ScanIndex(128, bits=1).load("/tmp/sh100k.npz")
    ids1, _ = single.search_batch(queries, k=10)
    agree = (np.asarray(ids) == np.asarray(ids1)).mean()
    r10_single = recall_at_k(np.asarray(ids1), gt.astype(np.int64), 10)
    print(f"single-chip agreement: {agree:.4f} "
          f"(single recall {r10_single:.4f})", flush=True)

    # ---- adversarial SKEWED partition (VERDICT r4 weak #5): sort the
    # base so contiguous shards hold whole clusters — per-shard
    # calibration samples and budget cohorts then see maximally
    # non-exchangeable data, the worst case for the pooled global fit.
    centers_axis = base @ np.linalg.svd(
        base[:4096] - base[:4096].mean(0), full_matrices=False
    )[2][0]
    perm = np.argsort(centers_axis, kind="stable")
    inv = np.empty_like(perm)
    inv[perm] = np.arange(len(perm))
    base_sk = np.ascontiguousarray(base[perm])
    gt_sk = inv[gt.astype(np.int64)]
    idx_sk = sharded.ShardedScanIndex(128, bits=1).build(base_sk, mesh)
    ids_sk, _ = idx_sk.search_batch(queries, k=10)
    r10_sk = recall_at_k(np.asarray(ids_sk), gt_sk, 10)
    print(f"skewed (cluster-sorted) partition: recall@10={r10_sk:.4f}",
          flush=True)

    out = {
        "mesh": "2 data x 4 model (virtual CPU)",
        "n": len(base), "dim": 128, "bits": 1, "k": 10,
        "recall_at_10": round(float(r10), 4),
        "single_chip_recall_at_10": round(float(r10_single), 4),
        "id_agreement_vs_single": round(float(agree), 4),
        "skewed_partition_recall_at_10": round(float(r10_sk), 4),
        "build": "shard-native (round 5)",
        "build_s": round(build_s, 1),
    }
    res = Path(__file__).parent.parent / "results"
    res.mkdir(exist_ok=True)
    (res / "sharded_100k_cpu_mesh.json").write_text(
        json.dumps(out, indent=1)
    )
    print("written", flush=True)
    assert r10 >= 0.95
    assert r10_sk >= 0.95, f"skewed-partition recall {r10_sk}"


if __name__ == "__main__":
    main()
