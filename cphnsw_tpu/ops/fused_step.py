"""Fused Pallas candidate-scoring kernel for the beam-search step.

The TPU-native re-expression of the reference's per-pop hot path — 32-wide
VPSHUFB FastScan + distance conversion consumed per beam expansion
(/root/reference/include/cphnsw/distance/fastscan_kernel.hpp:17-87, :89-194,
:197-346, consumed at search/rabitq_search.hpp:159-206) — as ONE kernel
that keeps every intermediate in VMEM:

  gather (manual DMA of fused node rows by popped id)
    -> channel assembly (static lane rolls + masks; each node row is a
       (S, 128) int32 tile whose channels live in 32-lane quarters)
    -> bit-plane expansion along sublanes
    -> MXU matvec per query against the 4-bit-quantized rotated query
       (fs and popcount in one (2, P) x (P, 128) matmul via a ones row)
    -> A*fs + B*wpc + C decode, affine correction, distance + lower bound.

The XLA expression of the same chain (search/beam.py use_pallas=False)
materializes the gathered rows, unpacked codes and every elementwise stage
in HBM, which bounds the step at ~20 GB/s effective; here the only HBM
traffic is the node rows in and the (est, lower, ids) tiles out.

Layout contract (NeighborStore.pack, graph/build.py): R == 32, fused row =
32-lane channels [ids][nop][ip_qo][ip_cp][wpc][plane words, plane-major,
MSB plane first] zero-padded to S*128 int32.  Per grid step the kernel
scores QB=8 queries x E popped nodes each = E*32 candidates per query.

Numerics match the XLA path bit-for-bit: plane bits are exact in f32, the
quantized query levels are <= 15, so every fs value is an exactly
representable small integer; the decode algebra is identical.

Mosaic constraints honoured (validated by exp/mosaic_smoke*.py on TPU):
node-row DMA shape (S, 128); no sub-128-lane value slicing (channels are
extracted with pltpu.roll + lane-iota masks); bit expansion broadcasts
along sublanes with int32 logical shifts; matvecs are per-query M<=2
matmuls (batched dot_general hits a Mosaic attribute-parser bug); scalar
broadcast via masked keepdims-max reduction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cphnsw_tpu.ops.quantize import EPS_MEDIUM, EPS_SMALL

QB = 8          # queries per grid step (f32 sublane tile)
LANES = 128
CH_PER_ROW = 4  # 32-lane channels per 128-lane row


def _bcast_lane(tile, j):
    """Broadcast lane j of (QB, 128) to all lanes (masked max-reduce)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, tile.shape, 1)
    only = jnp.where(lane == j, tile, -jnp.inf)
    return jnp.broadcast_to(
        jnp.max(only, axis=1, keepdims=True), tile.shape
    )


def _kernel(
    idx_ref, qu_ref, sc_ref, dqp_ref, hbm_ref,
    est_ref, lower_ref, ids_ref,
    *, e, s, p, bits, words,
):
    groups = (e + CH_PER_ROW - 1) // CH_PER_ROW    # 128-candidate groups
    dim_groups = max(p // LANES, 1)
    dim_span = min(p, LANES)                        # dims per matmul slab
    words_per_group = dim_span // 32
    k_scale = float((1 << bits) - 1)
    msb_planes = 1 if bits < 2 else 2
    msb_scale = 1.0 if bits < 2 else 3.0

    def body(scratch, sem):
        for q in range(QB):
            for ei in range(e):
                pltpu.make_async_copy(
                    hbm_ref.at[idx_ref[q, ei]], scratch.at[q, ei],
                    sem.at[q, ei],
                ).start()
        for q in range(QB):
            for ei in range(e):
                pltpu.make_async_copy(
                    hbm_ref.at[idx_ref[q, ei]], scratch.at[q, ei],
                    sem.at[q, ei],
                ).wait()
        x = scratch[...]                            # (QB, E, S, 128)
        lane = jax.lax.broadcasted_iota(jnp.int32, (QB, LANES), 1)
        bit = jax.lax.broadcasted_iota(jnp.int32, (QB, 32, LANES), 1)
        qu = qu_ref[...]                            # (QB, P)
        ones_row = jnp.ones((1, dim_span), jnp.float32)

        for g in range(groups):                     # candidate groups of 128
            e_lo = g * CH_PER_ROW
            e_n = min(CH_PER_ROW, e - e_lo)

            def chan_i32(ch):
                """(QB, 128) tile: channel ch of nodes e_lo..e_lo+e_n-1,
                node j's 32 values at lanes [32j, 32j+32)."""
                row, cm = ch // CH_PER_ROW, ch % CH_PER_ROW
                acc = jnp.zeros((QB, LANES), jnp.int32)
                for j in range(e_n):
                    piece = pltpu.roll(
                        x[:, e_lo + j, row, :],
                        (32 * j - 32 * cm) % LANES, 1,
                    )
                    sel = (lane >= 32 * j) & (lane < 32 * j + 32)
                    acc = jnp.where(sel, piece, acc)
                return acc

            def chan_f32(ch):
                return pltpu.bitcast(chan_i32(ch), jnp.float32)

            ids_t = chan_i32(0)
            nop = chan_f32(1)
            ip_qo_raw = chan_f32(2)
            ip_cp = chan_f32(3)

            # --- per-plane fastscan: fs_b and popcount pc_b from one
            # (2, dims) x (dims, 128) matmul per (query, plane, dimgroup)
            fs_pc = [None] * bits                   # each (QB, 2, 128)
            for b in range(bits):
                per_q = []
                for q in range(QB):
                    acc = None
                    for dg in range(dim_groups):
                        parts = []
                        for wi in range(words_per_group):
                            w = dg * words_per_group + wi
                            wt = chan_i32(5 + b * words + w)
                            wb = jnp.broadcast_to(
                                wt[:, None, :], (QB, 32, LANES)
                            )
                            parts.append(
                                (
                                    jax.lax.shift_right_logical(wb, bit)
                                    & jnp.int32(1)
                                ).astype(jnp.float32)
                            )
                        u = (
                            jnp.concatenate(parts, axis=1)
                            if len(parts) > 1 else parts[0]
                        )                           # (QB, dim_span, 128)
                        qv = qu[q : q + 1, dg * dim_span : (dg + 1) * dim_span]
                        lhs = jnp.concatenate([qv, ones_row], axis=0)
                        prod = jnp.dot(
                            lhs, u[q],
                            preferred_element_type=jnp.float32,
                        )                           # (2, 128)
                        acc = prod if acc is None else acc + prod
                    per_q.append(acc[None])
                fs_pc[b] = jnp.concatenate(per_q, axis=0)  # (QB, 2, 128)

            fs = jnp.zeros((QB, LANES), jnp.float32)
            wpc = jnp.zeros((QB, LANES), jnp.float32)
            for b in range(bits):
                wgt = float(1 << (bits - 1 - b))
                fs = fs + wgt * fs_pc[b][:, 0, :]
                wpc = wpc + wgt * fs_pc[b][:, 1, :]
            if bits >= 2:
                fs_m = 2.0 * fs_pc[0][:, 0, :] + fs_pc[1][:, 0, :]
                wpc_m = 2.0 * fs_pc[0][:, 1, :] + fs_pc[1][:, 1, :]

            # --- decode (fastscan_kernel.hpp:89-194 algebra) ---
            sc = sc_ref[...]                        # (QB, 128), 7 used
            a_c = _bcast_lane(sc, 0)
            b_c = _bcast_lane(sc, 1)
            c_c = _bcast_lane(sc, 2)
            aff_a = _bcast_lane(sc, 3)
            aff_b = _bcast_lane(sc, 4)
            floor = _bcast_lane(sc, 5)
            slack = _bcast_lane(sc, 6)

            inv_k = 1.0 / k_scale
            ip_full = a_c * inv_k * fs + b_c * inv_k * wpc + c_c
            if bits >= 2:
                inv_m = 1.0 / msb_scale
                ip_b = a_c * inv_m * fs_m + b_c * inv_m * wpc_m + c_c
            else:
                ip_b = ip_full

            ip_qo = jnp.maximum(ip_qo_raw, floor)
            good = ip_qo > EPS_MEDIUM
            safe_qo = jnp.maximum(ip_qo, EPS_MEDIUM)
            ip_est = aff_a * jnp.where(
                good, (ip_full - ip_cp) / safe_qo, 0.0
            ) + aff_b
            ip_est_b = aff_a * jnp.where(
                good, (ip_b - ip_cp) / safe_qo, 0.0
            ) + aff_b

            dqp = dqp_ref[:, g * LANES : (g + 1) * LANES]
            sqrt_dqp = jnp.sqrt(jnp.maximum(dqp, 0.0))
            est = jnp.maximum(nop * nop + dqp - 2.0 * nop * ip_est, 0.0)
            cos_u = jnp.clip(
                (ip_est_b + slack) / jnp.maximum(sqrt_dqp, EPS_MEDIUM),
                -1.0, 1.0,
            )
            lower = jnp.maximum(
                nop * nop + dqp - 2.0 * nop * sqrt_dqp * cos_u, 0.0
            )
            lower = jnp.where(good, lower, 0.0)
            degen = dqp < EPS_SMALL
            est = jnp.where(degen, nop * nop + dqp, est)
            lower = jnp.where(degen, 0.0, lower)

            est_ref[:, g * LANES : (g + 1) * LANES] = est
            lower_ref[:, g * LANES : (g + 1) * LANES] = lower
            ids_ref[:, g * LANES : (g + 1) * LANES] = ids_t

    pl.run_scoped(
        body,
        scratch=pltpu.VMEM((QB, e, s, LANES), jnp.int32),
        sem=pltpu.SemaphoreType.DMA((QB, e)),
    )


@functools.partial(
    jax.jit, static_argnames=("bits", "e", "p", "interpret")
)
def fused_score(
    pop_ids: jax.Array,   # (Q, E) int32 popped node ids (clamped valid)
    qu: jax.Array,        # (Q, P) f32 quantized query levels
    scalars: jax.Array,   # (Q, 128) f32, lanes 0-6 = [A, B, C, affine_a,
                          #   affine_b, ip_qo_floor, dot_slack]
    dqp_flat: jax.Array,  # (Q, G*128) f32 parent dist^2 per candidate lane
    fused_hbm: jax.Array, # (N, S, 128) int32 node rows (NeighborStore
                          #   .fused reshaped)
    bits: int,
    e: int,
    p: int,
    interpret: bool = False,
):
    """Score E*32 graph candidates per query.

    Returns (est, lower, nbr_ids), each (Q, G*128) with G = ceil(E/4);
    candidate c of expansion ei lives at lane (ei%4)*32 + c of group ei//4.
    Lanes beyond E*32 of the last group are garbage (masked by callers via
    nbr_ids validity).
    """
    q = pop_ids.shape[0]
    assert q % QB == 0, f"query batch {q} must be a multiple of {QB}"
    s = fused_hbm.shape[1]
    words = p // 32
    groups = (e + CH_PER_ROW - 1) // CH_PER_ROW
    out_w = groups * LANES
    kern = functools.partial(
        _kernel, e=e, s=s, p=p, bits=bits, words=words
    )
    grid = (q // QB,)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((QB, e), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((QB, p), lambda i: (i, 0)),
            pl.BlockSpec((QB, LANES), lambda i: (i, 0)),
            pl.BlockSpec((QB, out_w), lambda i: (i, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((QB, out_w), lambda i: (i, 0)),
            pl.BlockSpec((QB, out_w), lambda i: (i, 0)),
            pl.BlockSpec((QB, out_w), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((q, out_w), jnp.float32),
            jax.ShapeDtypeStruct((q, out_w), jnp.float32),
            jax.ShapeDtypeStruct((q, out_w), jnp.int32),
        ],
        interpret=interpret,
    )(pop_ids, qu, scalars, dqp_flat, fused_hbm)
