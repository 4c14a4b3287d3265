"""Pallas row-gather prototype (TPU).

MEASUREMENT (v5e via tunnel, 4096 x 1.15KB rows from a 1M-row table):
standalone XLA gather runs at ~205 GB/s — row gathers are NOT the search
bottleneck.  The beam step's cost instead scales ~70 ns per
(query x candidate) across all components (memory-traffic-bound at ~20
GB/s effective inside the while_loop), so the round-2 lever is a fused
Pallas step kernel that keeps candidate tiles in VMEM across
unpack/dot/convert/select instead of bouncing each intermediate through
HBM — not a gather replacement.

This prototype is kept for that work: the scalar-prefetched index map is
the idiomatic Pallas dynamic-row-DMA pattern (note the TPU lowering
requires (8,128)-aligned blocks, so a production kernel gathers row
GROUPS of 8).
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
