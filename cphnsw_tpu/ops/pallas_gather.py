"""Pallas row-gather kernels (TPU).

The beam-search step is bound by row gathers that XLA's gather lowering
runs at ~2.4 GB/s effective on this part.  Pallas can express the same
gather as a pipelined sequence of per-row DMAs via a scalar-prefetched
index map (the grid walks output rows; each source block's index comes
from the prefetched index array), which double-buffers HBM->VMEM copies.

Used behind a flag / for benchmarking; the XLA path remains the default
until the Pallas path is measured faster on the target part.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # TPU-only import; CPU tests fall back to interpret mode
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    _HAS_PLTPU = False


def _copy_kernel(idx_ref, src_ref, out_ref):
    # src_ref is the (1, F) block selected by the index map; just copy.
    out_ref[...] = src_ref[...]


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_rows(src: jax.Array, idx: jax.Array, interpret: bool = False):
    """out[i] = src[idx[i]] via a pipelined Pallas row-DMA gather.

    src: (N, F); idx: (M,) int32.  Returns (M, F).
    """
    m = idx.shape[0]
    f = src.shape[1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(m,),
        in_specs=[
            pl.BlockSpec((1, f), lambda i, idx_ref: (idx_ref[i], 0)),
        ],
        out_specs=pl.BlockSpec((1, f), lambda i, idx_ref: (i, 0)),
    )
    return pl.pallas_call(
        _copy_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, f), src.dtype),
        interpret=interpret,
    )(idx.astype(jnp.int32), src)
