"""Mosaic primitive smoke tests for the round-2 search megakernel.

Each test isolates one primitive the megakernel design depends on, so a
rejection points at exactly one construct.  Run on the REAL TPU (layout
rules differ from interpret mode):

    python exp/mosaic_smoke.py
"""

import functools
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
                print(f"[FAIL] {name}: {e}", flush=True)
                traceback.print_exc(limit=3)
        wrapper()
    return deco


# ---------------------------------------------------------------- 1
@run("scalar_extract_and_dynamic_dma")
def _():
    """Extract a scalar from a computed VMEM value, use it as a dynamic
    row index for an HBM->VMEM DMA."""
    n, p = 64, 128

    def kernel(idx_ref, hbm_ref, out_ref):
        def body(scratch, sem):
            for q in range(QB):
                i = idx_ref[q, 0]          # scalar read from int32 VMEM
                dma = pltpu.make_async_copy(
                    hbm_ref.at[i], scratch.at[q], sem.at[q]
                )
                dma.start()
            for q in range(QB):
                pltpu.make_async_copy(
                    hbm_ref.at[idx_ref[q, 0]], scratch.at[q], sem.at[q]
                ).wait()
            out_ref[...] = scratch[...]

        pl.run_scoped(
            body,
            scratch=pltpu.VMEM((QB, p), jnp.float32),
            sem=pltpu.SemaphoreType.DMA((QB,)),
        )

    x = np.arange(n * p, dtype=np.float32).reshape(n, p)
    idx = np.array([[3], [10], [0], [63], [5], [5], [1], [2]], np.int32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((QB, p), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray(idx), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), x[idx[:, 0]])


# ---------------------------------------------------------------- 2
@run("vector_to_scalar_extract_for_dma")
def _():
    """The harder variant: the row index comes from a VECTOR computation
    (argmin-style onehot sum) inside the kernel, not from SMEM."""
    n, p = 64, 128

    def kernel(est_ref, ids_ref, hbm_ref, out_ref):
        est = est_ref[...]                       # (QB, 128) f32
        ids = ids_ref[...]                       # (QB, 128) i32
        m = jnp.min(est, axis=1, keepdims=True)
        onehot = est <= m
        big = jnp.int32(2**31 - 1)
        pop = jnp.min(jnp.where(onehot, ids, big), axis=1, keepdims=True)

        def body(scratch, sem):
            for q in range(QB):
                i = pop[q, 0]                    # traced scalar from vector
                pltpu.make_async_copy(
                    hbm_ref.at[i], scratch.at[q], sem.at[q]
                ).start()
            for q in range(QB):
                pltpu.make_async_copy(
                    hbm_ref.at[pop[q, 0]], scratch.at[q], sem.at[q]
                ).wait()
            out_ref[...] = scratch[...]

        pl.run_scoped(
            body,
            scratch=pltpu.VMEM((QB, p), jnp.float32),
            sem=pltpu.SemaphoreType.DMA((QB,)),
        )

    x = np.random.default_rng(0).standard_normal((n, p)).astype(np.float32)
    est = np.random.default_rng(1).standard_normal((QB, 128)).astype(
        np.float32
    )
    ids = np.random.default_rng(2).integers(0, n, (QB, 128)).astype(np.int32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((QB, p), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray(est), jnp.asarray(ids), jnp.asarray(x))
    want = x[ids[np.arange(QB), est.argmin(1)]]
    np.testing.assert_allclose(np.asarray(out), want)


# ---------------------------------------------------------------- 3
@run("bit_expand_reduce_3d")
def _():
    """u32 word -> 32 candidate bits (middle axis) -> weighted lane+mid
    reduce.  The fastscan core: fs[qe, c] = sum_d bit(w[qe,d], c)*q[qe,d]."""
    QE, P = 32, 128

    def kernel(w_ref, q_ref, out_ref):
        w = w_ref[...].astype(jnp.int32)         # (QE, P) words
        c_idx = jax.lax.broadcasted_iota(jnp.int32, (1, 32, 1), 1)
        bits = (
            (jax.lax.shift_right_logical(w[:, None, :], c_idx) & 1)
        ).astype(jnp.float32)                    # (QE, 32, P)
        fs = jnp.sum(bits * q_ref[...][:, None, :], axis=-1)  # (QE, 32)
        out_ref[...] = fs

    rng = np.random.default_rng(0)
    w = rng.integers(0, 2**31, (QE, P)).astype(np.int32)
    q = rng.standard_normal((QE, P)).astype(np.float32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((QE, 32), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray(w), jnp.asarray(q))
    bits = ((w[:, None, :].astype(np.int64) >> np.arange(32)[None, :, None])
            & 1)
    want = (bits * q[:, None, :]).sum(-1).astype(np.float32)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-4)


# ---------------------------------------------------------------- 4
@run("roll_insert_loop_fori")
def _():
    """fori_loop over candidates: static lane-0 slice + pltpu.roll by 1,
    worst-replacement insert into a 128-lane 'beam'."""

    def kernel(beam_ref, cand_ref, out_ref):
        def body(c, carry):
            beam, cand = carry
            val = cand[:, 0:1]                   # (QB, 1)
            worst = jnp.max(beam, axis=1, keepdims=True)
            lane = jax.lax.broadcasted_iota(jnp.int32, beam.shape, 1)
            first_worst = jnp.cumsum(
                (beam >= worst).astype(jnp.int32), axis=1
            ) == 1
            replace = (val < worst) & first_worst
            beam = jnp.where(replace, val, beam)
            cand = pltpu.roll(cand, -1, 1)
            return beam, cand

        beam, _ = jax.lax.fori_loop(
            0, 32, body, (beam_ref[...], cand_ref[...])
        )
        out_ref[...] = beam

    rng = np.random.default_rng(0)
    beam = rng.standard_normal((QB, 128)).astype(np.float32) + 10.0
    cand = rng.standard_normal((QB, 32)).astype(np.float32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((QB, 128), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray(beam), jnp.asarray(cand))
    # emulate
    b = beam.copy()
    for c in range(32):
        v = cand[:, c]
        w = b.argmax(1)
        repl = v < b[np.arange(QB), w]
        b[np.arange(QB)[repl], w[repl]] = v[repl]
    np.testing.assert_allclose(np.asarray(out), b, rtol=1e-6)


# ---------------------------------------------------------------- 5
@run("while_loop_with_vmem_state")
def _():
    """lax.while_loop whose cond reads a scalar reduction of VMEM scratch
    state mutated in the body."""

    def kernel(x_ref, out_ref):
        def scoped(acc):
            acc[...] = x_ref[...]

            def cond(step):
                return (jnp.sum(acc[...]) < 1e6) & (step < 20)

            def body(step):
                acc[...] = acc[...] * 2.0
                return step + 1

            jax.lax.while_loop(cond, body, jnp.int32(0))
            out_ref[...] = acc[...]

        pl.run_scoped(scoped, pltpu.VMEM((QB, 128), jnp.float32))

    x = np.full((QB, 128), 1.0, np.float32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((QB, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray(x))
    want = x.copy()
    while want.sum() < 1e6:
        want *= 2
    np.testing.assert_allclose(np.asarray(out), want)


# ---------------------------------------------------------------- 6
@run("sorted_insert_via_roll_select")
def _():
    """Insert a value into a sorted 128-lane row: pos = sum(row < v),
    lanes >= pos shift right by one (roll + select)."""

    def kernel(row_ref, val_ref, out_ref):
        row = row_ref[...]                        # (QB, 128) sorted asc
        v = val_ref[...]                          # (QB, 1)
        pos = jnp.sum((row < v).astype(jnp.int32), axis=1, keepdims=True)
        lane = jax.lax.broadcasted_iota(jnp.int32, row.shape, 1)
        shifted = pltpu.roll(row, 1, 1)
        row2 = jnp.where(lane > pos, shifted, row)
        row2 = jnp.where(lane == pos, v, row2)
        out_ref[...] = row2

    rng = np.random.default_rng(0)
    row = np.sort(rng.standard_normal((QB, 128)).astype(np.float32), axis=1)
    val = rng.standard_normal((QB, 1)).astype(np.float32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((QB, 128), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray(row), jnp.asarray(val))
    want = np.sort(
        np.concatenate([row, val], axis=1), axis=1
    )[:, :128].astype(np.float32)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-6)


# ---------------------------------------------------------------- 7
@run("membership_compare_3d")
def _():
    """seen[q, c] = any_b(cand[q, c] == beam[q, b]) via a (QB, 32, 128)
    broadcast compare + lane-reduce."""

    def kernel(cand_ref, beam_ref, out_ref):
        cand = cand_ref[...]                      # (QB, 32) i32
        beam = beam_ref[...]                      # (QB, 128) i32
        eq = cand[:, :, None] == beam[:, None, :]
        out_ref[...] = jnp.any(eq, axis=-1).astype(jnp.int32)

    rng = np.random.default_rng(0)
    cand = rng.integers(0, 50, (QB, 32)).astype(np.int32)
    beam = rng.integers(0, 50, (QB, 128)).astype(np.int32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((QB, 32), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray(cand), jnp.asarray(beam))
    want = (cand[:, :, None] == beam[:, None, :]).any(-1).astype(np.int32)
    np.testing.assert_allclose(np.asarray(out), want)


# ---------------------------------------------------------------- 8
@run("sublane_repeat_and_block_slice")
def _():
    """pltpu.repeat along sublanes (query->expansion replication) and a
    static sublane block slice of the result."""

    def kernel(q_ref, out_ref):
        q = q_ref[...]                            # (QB, 128)
        rep = pltpu.repeat(q, 4, 0)               # (4*QB, 128) tiled
        out_ref[...] = rep[QB : 2 * QB, :] * 2.0  # block e=1

    x = np.random.default_rng(0).standard_normal((QB, 128)).astype(
        np.float32
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((QB, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), x * 2.0, rtol=1e-6)


# ---------------------------------------------------------------- 9
@run("cumsum_lanes")
def _():
    def kernel(x_ref, out_ref):
        out_ref[...] = jnp.cumsum(x_ref[...], axis=1)

    x = np.random.default_rng(0).standard_normal((QB, 128)).astype(
        np.float32
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((QB, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), np.cumsum(x, 1), rtol=1e-4)


# ---------------------------------------------------------------- 10
@run("dma_2d_block_and_middle_slice")
def _():
    """DMA a (6, 32) aux block by dynamic row, then slice channel c via a
    middle-dim index on the (QB, 6, 32) scratch."""
    n = 64

    def kernel(idx_ref, hbm_ref, out_ref):
        def body(scratch, sem):
            for q in range(QB):
                pltpu.make_async_copy(
                    hbm_ref.at[idx_ref[q, 0]], scratch.at[q], sem.at[q]
                ).start()
            for q in range(QB):
                pltpu.make_async_copy(
                    hbm_ref.at[idx_ref[q, 0]], scratch.at[q], sem.at[q]
                ).wait()
            s = scratch[...]                      # (QB, 6, 32)
            out_ref[...] = s[:, 2, :] + s[:, 5, :]

        pl.run_scoped(
            body,
            scratch=pltpu.VMEM((QB, 6, 32), jnp.float32),
            sem=pltpu.SemaphoreType.DMA((QB,)),
        )

    x = np.random.default_rng(0).standard_normal((n, 6, 32)).astype(
        np.float32
    )
    idx = np.array([[3], [10], [0], [63], [5], [5], [1], [2]], np.int32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((QB, 32), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray(idx), jnp.asarray(x))
    want = x[idx[:, 0], 2, :] + x[idx[:, 0], 5, :]
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-6)


print("\nSummary:")
for k, v in RESULTS.items():
    print(f"  {k}: {v}")
