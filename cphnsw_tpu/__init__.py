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

from cphnsw_tpu.api.index import CPIndex, Index

__all__ = ["CPIndex", "Index"]
__version__ = "0.1.0"
