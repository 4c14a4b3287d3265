"""cphnsw_tpu — TPU-native CP-HNSW: calibration-parameterless ANN search.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the CP-HNSW
reference library (indrajeetadityaroy9/rabitq-ann-search):

* Parameter-free search — all search hyperparameters derived at build time
  by an EVT-CRC statistical calibration pipeline.
* DABS (Distance-Adaptive Beam Search) with online gamma adaptation.
* N-bit RaBitQ + CAQ quantization of edge residuals, scanned with MXU
  int-matmul kernels (the TPU-native replacement for AVX2 VPSHUFB FastScan),
  with exact-L2 reranking.

Public API (mirrors reference `cphnsw.CPIndex`, src/bindings.cpp:115-240):
    CPIndex(dim, bits) . build / finalize / search / search_batch /
    save / load / size / dim / is_finalized
"""

import os as _os

# Persistent XLA compilation cache: first-compile latency on remote TPU
# backends is tens of seconds per program; cache hits are milliseconds.
if "JAX_COMPILATION_CACHE_DIR" not in _os.environ:
    try:
        import jax as _jax

        # per-platform subdirectory: AOT artifacts compiled for the remote
        # TPU host poison a CPU process (and vice versa) if shared
        _plat = (_jax.config.jax_platforms or "tpu").split(",")[0]
        if _plat != "cpu":  # CPU compiles are fast; cache only remote TPU
            _cache = _os.path.join(
                _os.path.dirname(__file__), "..", ".jax_cache", _plat
            )
            _jax.config.update(
                "jax_compilation_cache_dir", _os.path.abspath(_cache)
            )
            _jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 0.5
            )
    except Exception:  # pragma: no cover - cache is best-effort
        pass

from cphnsw_tpu.api.index import CPIndex, Index

__all__ = [
    "CPIndex", "Index", "ScanIndex", "ShardedIndex", "ShardedScanIndex"
]


def __getattr__(name):  # lazy: parallel/ pulls in shard_map machinery
    if name in ("ShardedIndex", "ShardedScanIndex"):
        from cphnsw_tpu.parallel import sharded

        return getattr(sharded, name)
    if name == "ScanIndex":
        from cphnsw_tpu.api.scan_index import ScanIndex

        return ScanIndex
    raise AttributeError(name)
__version__ = "0.1.0"
