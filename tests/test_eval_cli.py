import json
import subprocess
import sys
from pathlib import Path

import numpy as np

from cphnsw_tpu.utils import datasets
from cphnsw_tpu.utils.eval import recall_at_k, run_benchmark


def test_recall_at_k_definition():
    res = np.array([[1, 2, 3], [4, 5, 6]])
    gt = np.array([[1, 9, 8], [6, 5, 4]])
    # row0 hits 1/3, row1 hits 3/3 -> mean 2/3
    assert abs(recall_at_k(res, gt, 3) - 2 / 3) < 1e-9


def test_fvecs_roundtrip(tmp_path, rng):
    x = rng.standard_normal((7, 5)).astype(np.float32)
    raw = np.concatenate(
        [np.full((7, 1), 5, np.int32).view(np.float32), x], axis=1
    )
    p = tmp_path / "v.fvecs"
    raw.astype(np.float32).tofile(p)
    back = datasets.read_fvecs(p)
    np.testing.assert_array_equal(back, x)


def test_synthetic_groundtruth_exact(rng):
    ds = datasets.make_synthetic("synthetic-2k-16d", n_queries=20, gt_k=5)
    base, q, gt = ds["base"], ds["queries"], ds["groundtruth"]
    d = ((q[:, None, :] - base[None, :, :]) ** 2).sum(-1)
    want = np.argsort(d, axis=1)[:, :5]
    np.testing.assert_array_equal(np.sort(gt, 1), np.sort(want, 1))


def test_run_benchmark_smoke(tmp_path):
    out = run_benchmark(
        "synthetic-2k-16d", tmp_path, k=10, n_runs=2, output_dir=tmp_path,
        bit_widths=[1],
    )
    algo = out["results"][0]
    assert algo["algorithm"] == "cphnsw-tpu-1bit"
    assert algo["recall_at_10"] > 0.8
    assert algo["qps"] > 0
    assert (tmp_path / "synthetic-2k-16d_results.json").exists()
    # ADR >= 1 by definition (found dists cannot beat ground truth)
    assert algo["adr"] >= 0.999


def test_cli_json_lines(tmp_path):
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(
        f"""run:
  output_dir: {tmp_path / 'results'}

data:
  dataset: synthetic-2k-16d
  base_dir: {tmp_path}

eval:
  k: 10
  n_runs: 1
"""
    )
    env = {
        "PYTHONPATH": str(Path(__file__).resolve().parent.parent),
        "PATH": "/usr/bin:/bin",
        "JAX_PLATFORMS": "cpu",
        "HOME": "/root",
    }
    proc = subprocess.run(
        [sys.executable, "-m", "cphnsw_tpu", "--config", str(cfg)],
        capture_output=True, text=True, env=env, timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    events = [json.loads(l) for l in proc.stdout.splitlines() if l.startswith("{")]
    kinds = [e["event"] for e in events]
    assert "benchmark_start" in kinds and "summary" in kinds
    summaries = [e for e in events if e["event"] == "summary"]
    assert {"dataset", "algorithm", "build_time_min", "memory_gib",
            "recall_at_10", "qps"} <= set(summaries[0])
