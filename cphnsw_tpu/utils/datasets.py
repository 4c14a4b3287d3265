"""Dataset loaders: fvecs/ivecs + npy benchmark sets.

Mirrors /root/reference/cphnsw/datasets.py:8-52 (same on-disk formats and
dataset registry), plus a synthetic generator used when no benchmark data is
mounted (so `bench.py` and smoke evals always run).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

FVECS_DATASETS = {
    "sift1m": {
        "base": "sift_base.fvecs",
        "queries": "sift_query.fvecs",
        "groundtruth": "sift_groundtruth.ivecs",
    },
    "gist1m": {
        "base": "gist_base.fvecs",
        "queries": "gist_query.fvecs",
        "groundtruth": "gist_groundtruth.ivecs",
    },
}

NPY_DATASETS = {"openai1536", "msmarco10m", "deep10m"}

ALL_DATASETS = list(FVECS_DATASETS.keys()) + sorted(NPY_DATASETS)


def read_fvecs(path: Path) -> np.ndarray:
    raw = np.fromfile(path, dtype=np.float32)
    dim = raw[:1].view(np.int32)[0]
    return raw.reshape(-1, dim + 1)[:, 1:].copy()


def read_ivecs(path: Path) -> np.ndarray:
    raw = np.fromfile(path, dtype=np.int32)
    k = int(raw[0])
    return raw.reshape(-1, k + 1)[:, 1:].copy()


def load_dataset(name: str, base_dir: Path) -> dict:
    base_path = Path(base_dir) / name
    if name in FVECS_DATASETS:
        files = FVECS_DATASETS[name]
        base = read_fvecs(base_path / files["base"])
        queries = read_fvecs(base_path / files["queries"])
        groundtruth = read_ivecs(base_path / files["groundtruth"])
    elif name in NPY_DATASETS:
        base = np.load(base_path / "base.npy").astype(np.float32)
        queries = np.load(base_path / "queries.npy").astype(np.float32)
        groundtruth = np.load(base_path / "groundtruth.npy").astype(np.int32)
    elif name.startswith("synthetic"):
        return make_synthetic(name)
    else:
        raise ValueError(f"Unknown dataset: {name}")
    return {
        "base": base,
        "queries": queries,
        "groundtruth": groundtruth,
        "dim": base.shape[1],
    }


def make_synthetic(
    name: str = "synthetic",
    n: int = 100_000,
    dim: int = 128,
    n_queries: int = 1000,
    gt_k: int = 100,
    n_clusters: int = 256,
    seed: int = 0,
    cache_dir: str | None = "/tmp/cphnsw_synth_cache",
) -> dict:
    """Clustered gaussian data with exact ground truth.

    `name` may encode size, e.g. "synthetic-100k-128d".  Ground-truth
    computation is O(n_queries * n * dim) on the host, so results are
    cached on disk keyed by the full parameter tuple.
    """
    if cache_dir:
        key = f"{name}-{n}-{dim}-{n_queries}-{gt_k}-{n_clusters}-{seed}"
        cpath = Path(cache_dir) / f"{key}.npz"
        if cpath.exists():
            with np.load(cpath) as z:
                return {
                    "base": z["base"], "queries": z["queries"],
                    "groundtruth": z["groundtruth"], "dim": int(z["dim"]),
                }
    parts = name.split("-")
    for p in parts[1:]:
        if p.endswith("k"):
            n = int(float(p[:-1]) * 1000)
        elif p.endswith("m"):
            n = int(float(p[:-1]) * 1_000_000)
        elif p.endswith("d"):
            dim = int(p[:-1])
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, dim)).astype(np.float32) * 3.0
    base = centers[rng.integers(0, n_clusters, n)] + rng.standard_normal(
        (n, dim)
    ).astype(np.float32)
    qi = rng.choice(n, n_queries, replace=False)
    queries = base[qi] + 0.1 * rng.standard_normal((n_queries, dim)).astype(
        np.float32
    )
    # exact ground truth in blocks (host)
    gt = np.empty((n_queries, gt_k), dtype=np.int32)
    bs = 256
    for s in range(0, n_queries, bs):
        q = queries[s : s + bs]
        d = (
            (q**2).sum(1)[:, None]
            - 2.0 * q @ base.T
            + (base**2).sum(1)[None, :]
        )
        gt[s : s + bs] = np.argpartition(d, gt_k, axis=1)[:, :gt_k][
            np.arange(len(q))[:, None],
            np.argsort(
                np.take_along_axis(
                    d, np.argpartition(d, gt_k, axis=1)[:, :gt_k], axis=1
                ),
                axis=1,
            ),
        ]
    if cache_dir:
        Path(cache_dir).mkdir(parents=True, exist_ok=True)
        np.savez(cpath, base=base, queries=queries, groundtruth=gt, dim=dim)
    return {
        "base": base,
        "queries": queries,
        "groundtruth": gt,
        "dim": dim,
    }
