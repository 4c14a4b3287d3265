"""Fused Pallas candidate-estimate kernel for the beam-search step.

Fuses, for a block of QB=8 queries per grid step, the whole candidate-
scoring chain — bit-plane unpack -> integer fastscan dot -> A*fs+B*wpc+C
decode -> affine correction -> distance + lower bound — over the gathered
fused node rows, keeping every intermediate in VMEM.  The XLA expression
of the same chain materializes the unpacked codes and each elementwise
stage in HBM, which bounds the step at ~20 GB/s effective (see
ops/pallas_gather.py measurement notes); here the only HBM traffic is the
fused rows in and (est, lower) out.

1-bit only for now (the headline SIFT config); the XLA path remains the
reference implementation and the fallback for bits >= 2 (see
search/beam.py `use_pallas`).  TPU blocks must be (8, 128)-aligned on the
last two dims, hence the 8-query blocking.

STATUS: verified equivalent to the XLA path in interpret mode (tests);
Mosaic's automatic vector-layout inference on this jax version rejects
every formulation tried for the sub-128-lane bit-expansion tiles
(transpose reshapes, accumulating matmuls, 32-lane concats).  Round-2
plan: rewrite with explicit VMEM scratch + manual DMA (memory_space=ANY)
so tile layouts are chosen by hand instead of inferred.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from cphnsw_tpu.ops.quantize import EPS_MEDIUM, EPS_SMALL

QB = 8  # queries per grid step (TPU sublane alignment)


def _kernel(g_ref, qu_ref, sc_ref, dqp_ref, est_ref, lower_ref, *, r, e, w, p):
    """g (QB, E, F) int32; qu (QB, P) f32; sc (QB, 8) f32 scalars
    [A, B, C, affine_a, affine_b, floor, slack, _]; dqp (QB, E) f32.
    Outputs (QB, E*R) f32."""
    g = g_ref[...]                                   # (QB, E, F)
    qu = qu_ref[...]                                 # (QB, P)

    # per-expansion processing (python-unrolled over E) avoids the
    # transpose-like reshapes Mosaic cannot lower
    fs_parts, nop_parts, qo_parts, cp_parts, wpc_parts = [], [], [], [], []
    for ei in range(e):
        ge = g[:, ei, :]                             # (QB, F)
        nop_parts.append(
            jax.lax.bitcast_convert_type(ge[:, r : 2 * r], jnp.float32)
        )
        qo_parts.append(
            jax.lax.bitcast_convert_type(ge[:, 2 * r : 3 * r], jnp.float32)
        )
        cp_parts.append(
            jax.lax.bitcast_convert_type(ge[:, 3 * r : 4 * r], jnp.float32)
        )
        wpc_parts.append(
            jax.lax.bitcast_convert_type(ge[:, 4 * r : 5 * r], jnp.float32)
        )
        # word-major planes: slice one (QB, R) u32 tile per word, expand a
        # trailing 32-lane bit dim (broadcast, not a lane-splitting
        # reshape), concatenate the per-word bit tiles along lanes and do
        # ONE matmul (Mosaic requires constant matmul accumulators, so
        # per-word accumulate-into-fs is not lowerable)
        bit_idx = jax.lax.broadcasted_iota(jnp.uint32, (1, 1, 32), 2)
        tiles = []
        for wi in range(w):
            word = jax.lax.bitcast_convert_type(
                ge[:, 5 * r + wi * r : 5 * r + (wi + 1) * r], jnp.uint32
            )                                        # (QB, R)
            bits_w = ((word[:, :, None] >> bit_idx) & jnp.uint32(1))
            tiles.append(bits_w.astype(jnp.int32).astype(jnp.float32))
        u = jnp.concatenate(tiles, axis=2)[:, :, :p]  # (QB, R, P)
        fs_parts.append(
            jax.lax.dot_general(
                u, qu,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
        )
    fs = jnp.concatenate(fs_parts, axis=1)           # (QB, ER)
    nop = jnp.concatenate(nop_parts, axis=1)
    ip_qo_raw = jnp.concatenate(qo_parts, axis=1)
    ip_cp = jnp.concatenate(cp_parts, axis=1)
    wpc = jnp.concatenate(wpc_parts, axis=1)

    a_coef = sc_ref[:, 0:1]
    b_coef = sc_ref[:, 1:2]
    c_coef = sc_ref[:, 2:3]
    affine_a = sc_ref[:, 3:4]
    affine_b = sc_ref[:, 4:5]
    floor = sc_ref[:, 5:6]
    slack = sc_ref[:, 6:7]

    ip_approx = a_coef * fs + b_coef * wpc + c_coef
    ip_qo = jnp.maximum(ip_qo_raw, floor)
    good = ip_qo > EPS_MEDIUM
    ratio = jnp.where(
        good, (ip_approx - ip_cp) / jnp.maximum(ip_qo, EPS_MEDIUM), 0.0
    )
    ip_est = affine_a * ratio + affine_b

    dqp = dqp_ref[...]                               # (QB, E)
    # broadcast each expansion's d_qp over its R candidates (jnp.repeat
    # lowers to scatter, which Mosaic does not support)
    dqp_flat = jnp.concatenate(
        [jnp.broadcast_to(dqp[:, ei : ei + 1], (QB, r)) for ei in range(e)],
        axis=1,
    )
    sqrt_dqp = jnp.sqrt(jnp.maximum(dqp_flat, 0.0))

    est = jnp.maximum(nop * nop + dqp_flat - 2.0 * nop * ip_est, 0.0)
    cos_u = jnp.clip(
        (ip_est + slack) / jnp.maximum(sqrt_dqp, EPS_MEDIUM), -1.0, 1.0
    )
    lower = jnp.maximum(
        nop * nop + dqp_flat - 2.0 * nop * sqrt_dqp * cos_u, 0.0
    )
    lower = jnp.where(good, lower, 0.0)

    degen = dqp_flat < EPS_SMALL
    est = jnp.where(degen, nop * nop + dqp_flat, est)
    lower = jnp.where(degen, 0.0, lower)

    est_ref[...] = est
    lower_ref[...] = lower


@functools.partial(
    jax.jit, static_argnames=("r", "e", "w", "p", "interpret")
)
def fused_estimate_1bit(
    g: jax.Array,        # (Q, E, F) gathered fused rows (int32), Q % 8 == 0
    qu: jax.Array,       # (Q, P) quantized query levels, float32
    scalars: jax.Array,  # (Q, 8) f32: [A, B, C, affine_a, affine_b,
                         #              floor, slack, 0]
    dqp: jax.Array,      # (Q, E) f32 squared parent distances
    r: int,
    e: int,
    w: int,
    p: int,
    interpret: bool = False,
):
    """Returns (est (Q, E*R), lower (Q, E*R)) float32."""
    q = g.shape[0]
    assert q % QB == 0, f"query batch {q} must be a multiple of {QB}"
    er = e * r
    f = g.shape[2]
    kern = functools.partial(_kernel, r=r, e=e, w=w, p=p)
    return pl.pallas_call(
        kern,
        grid=(q // QB,),
        in_specs=[
            pl.BlockSpec((QB, e, f), lambda i: (i, 0, 0)),
            pl.BlockSpec((QB, p), lambda i: (i, 0)),
            pl.BlockSpec((QB, 8), lambda i: (i, 0)),
            pl.BlockSpec((QB, e), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((QB, er), lambda i: (i, 0)),
            pl.BlockSpec((QB, er), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((q, er), jnp.float32),
            jax.ShapeDtypeStruct((q, er), jnp.float32),
        ],
        interpret=interpret,
    )(g, qu, scalars, dqp)
