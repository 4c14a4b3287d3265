"""Smoke 5b: fix non-negative roll shifts; isolate the bit-expansion NIE."""

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
                print(f"[FAIL] {name}: {str(e)[:600]}", flush=True)
        wrapper()
    return deco


def rollmod(x, shift, axis):
    return pltpu.roll(x, shift % x.shape[axis], axis)


# ------------------------------------------------------------ assembly
@run("roll_mask_channel_assembly")
def _():
    E, CH = 4, 1

    def kernel(x_ref, out_ref):
        x = x_ref[...]
        lane = jax.lax.broadcasted_iota(jnp.int32, (QB, 128), 1)
        row, cm = CH // 4, CH % 4
        acc = jnp.zeros((QB, 128), jnp.int32)
        for e in range(E):
            piece = rollmod(x[:, e, row, :], 32 * e - 32 * cm, 1)
            sel = (lane >= 32 * e) & (lane < 32 * e + 32)
            acc = jnp.where(sel, piece, acc)
        out_ref[...] = acc

    rng = np.random.default_rng(0)
    x = rng.integers(0, 1000, (QB, 4, 3, 128)).astype(np.int32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((QB, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray(x))
    ref = np.zeros((QB, 128), np.int32)
    for e in range(4):
        ref[:, 32 * e : 32 * e + 32] = x[:, e, 0, 32:64]
    np.testing.assert_allclose(np.asarray(out), ref)


# ------------------------------------------------------------ expansion v1
@run("bit_expansion_u32_shift_3d")
def _():
    def kernel(w_ref, out_ref):
        w = w_ref[...]
        bit = jax.lax.broadcasted_iota(jnp.uint32, (QB, 32, 128), 1)
        wu = pltpu.bitcast(w, jnp.uint32)
        out_ref[...] = ((wu[:, None, :] >> bit) & jnp.uint32(1)).astype(
            jnp.float32
        )

    rng = np.random.default_rng(0)
    w = rng.integers(0, 2**31, (QB, 128)).astype(np.int32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((QB, 32, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray(w))
    ref = ((w.astype(np.uint32)[:, None, :] >> np.arange(32, dtype=np.uint32)[None, :, None]) & 1).astype(np.float32)
    np.testing.assert_allclose(np.asarray(out), ref)


# ------------------------------------------------------------ expansion v2
@run("bit_expansion_i32_shift_3d")
def _():
    """Same but int32 arithmetic-shift + mask (avoids u32 ops)."""

    def kernel(w_ref, out_ref):
        w = w_ref[...]
        bit = jax.lax.broadcasted_iota(jnp.int32, (QB, 32, 128), 1)
        wb = jnp.broadcast_to(w[:, None, :], (QB, 32, 128))
        out_ref[...] = (
            jax.lax.shift_right_logical(wb, bit) & jnp.int32(1)
        ).astype(jnp.float32)

    rng = np.random.default_rng(0)
    w = rng.integers(0, 2**31, (QB, 128)).astype(np.int32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((QB, 32, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray(w))
    ref = ((w.astype(np.uint32)[:, None, :] >> np.arange(32, dtype=np.uint32)[None, :, None]) & 1).astype(np.float32)
    np.testing.assert_allclose(np.asarray(out), ref)


# ------------------------------------------------------------ expansion v3
@run("bit_expansion_2d_unrolled")
def _():
    """Expand on 2-D tiles only: for each bit b, (QB,128) >> b & 1, write to
    out rows — no 3-D broadcast."""

    def kernel(w_ref, out_ref):
        w = w_ref[...]
        for b in range(32):
            out_ref[:, b, :] = (
                jax.lax.shift_right_logical(w, jnp.int32(b)) & jnp.int32(1)
            ).astype(jnp.float32)

    rng = np.random.default_rng(0)
    w = rng.integers(0, 2**31, (QB, 128)).astype(np.int32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((QB, 32, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray(w))
    ref = ((w.astype(np.uint32)[:, None, :] >> np.arange(32, dtype=np.uint32)[None, :, None]) & 1).astype(np.float32)
    np.testing.assert_allclose(np.asarray(out), ref)


# ------------------------------------------------------------ matvec
@run("batched_matvec_dot_general")
def _():
    """Just the batched (QB,128)x(QB,128,128) dot, floats in."""

    def kernel(qu_ref, u_ref, out_ref):
        out_ref[...] = jax.lax.dot_general(
            qu_ref[...], u_ref[...],
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    rng = np.random.default_rng(0)
    qu = rng.integers(0, 16, (QB, 128)).astype(np.float32)
    u = rng.integers(0, 2, (QB, 128, 128)).astype(np.float32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((QB, 128), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray(qu), jnp.asarray(u))
    ref = np.einsum("qp,qpc->qc", qu, u)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5)


# ------------------------------------------------------------ bitonic
@run("bitonic_stage_with_payload")
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

    rng = np.random.default_rng(0)
    k = rng.standard_normal((QB, 128)).astype(np.float32)
    v = rng.integers(0, 10000, (QB, 128)).astype(np.int32)
    ko, vo = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((QB, 128), jnp.float32),
            jax.ShapeDtypeStruct((QB, 128), jnp.int32),
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


print("\nSummary:")
for k, v in RESULTS.items():
    print(f"  {k}: {v}")
