"""Mosaic smoke tests round 4: megakernel-critical DMA shapes + loops.

Round-3 findings: dynamic .at[i] DMA of a (128,)-lane f32 row PASSES, but
1-D rows of 256/320 lanes and (6, 32) 2-D rows crash the remote compile
helper.  This round tests the shapes the megakernel actually needs:
(k, 128) 2-D node rows, int32 rows, DMAs issued inside lax.while_loop
bodies with loop-carried ids, and the rerank row-distance pattern.
"""

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
                print(f"[FAIL] {name}: {str(e)[:300]}", flush=True)
                traceback.print_exc(limit=2)
        wrapper()
    return deco


# ---------------------------------------------------------------- a
@run("dma_row_2d_3x128_f32")
def _():
    """Node-block gather: (N, 3, 128) f32, .at[i] -> (QB, 3, 128)."""
    n = 100_000

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
            s = scratch[...]                      # (QB, 3, 128)
            out_ref[...] = s[:, 0, :] + s[:, 1, :] * s[:, 2, :]

        pl.run_scoped(
            body,
            scratch=pltpu.VMEM((QB, 3, 128), jnp.float32),
            sem=pltpu.SemaphoreType.DMA((QB,)),
        )

    x = np.random.default_rng(0).standard_normal((n, 3, 128)).astype(
        np.float32
    )
    idx = np.array(
        [[3], [70_001], [0], [99_999], [5], [5], [7_777], [2]], np.int32
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((QB, 128), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray(idx), jnp.asarray(x))
    r = x[idx[:, 0]]
    np.testing.assert_allclose(
        np.asarray(out), r[:, 0] + r[:, 1] * r[:, 2], rtol=1e-5
    )


# ---------------------------------------------------------------- b
@run("dma_row_2d_3x128_int32")
def _():
    """Same but int32 (plane words + bitcast aux live in one i32 array)."""
    n = 50_000

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
            s = scratch[...]
            out_ref[...] = s[:, 0, :] ^ s[:, 2, :]

        pl.run_scoped(
            body,
            scratch=pltpu.VMEM((QB, 3, 128), jnp.int32),
            sem=pltpu.SemaphoreType.DMA((QB,)),
        )

    x = np.random.default_rng(0).integers(
        0, 2**31, (n, 3, 128)
    ).astype(np.int32)
    idx = np.array(
        [[3], [10_001], [0], [49_999], [5], [5], [7_777], [2]], np.int32
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((QB, 128), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray(idx), jnp.asarray(x))
    r = x[idx[:, 0]]
    np.testing.assert_allclose(np.asarray(out), r[:, 0] ^ r[:, 2])


# ---------------------------------------------------------------- c
@run("dma_inside_while_loop_carried_ids")
def _():
    """The megakernel skeleton: while_loop whose body extracts per-query
    ids from a loop-carried (QB, 128) value, DMAs those rows, computes,
    and feeds the result into the next iteration's ids."""
    n, p = 10_000, 128

    def kernel(hbm_ref, ids0_ref, out_ref):
        def scoped(scratch, sem):
            def cond(carry):
                step, ids, acc = carry
                return step < 4

            def body(carry):
                step, ids, acc = carry
                for q in range(QB):
                    pltpu.make_async_copy(
                        hbm_ref.at[ids[q, 0]], scratch.at[q], sem.at[q]
                    ).start()
                for q in range(QB):
                    pltpu.make_async_copy(
                        hbm_ref.at[ids[q, 0]], scratch.at[q], sem.at[q]
                    ).wait()
                rows = scratch[...]               # (QB, 128)
                acc = acc + rows
                # next id = (id*31 + 7) % n, data-independent chain kept
                # in a (QB, 128) i32 tile
                ids = (ids * 31 + 7) % n
                return step + 1, ids, acc

            _, _, acc = jax.lax.while_loop(
                cond,
                body,
                (jnp.int32(0), ids0_ref[...],
                 jnp.zeros((QB, p), jnp.float32)),
            )
            out_ref[...] = acc

        pl.run_scoped(
            scoped,
            scratch=pltpu.VMEM((QB, p), jnp.float32),
            sem=pltpu.SemaphoreType.DMA((QB,)),
        )

    x = np.random.default_rng(0).standard_normal((n, p)).astype(np.float32)
    ids0 = np.broadcast_to(
        np.array([3, 11, 0, 999, 5, 5, 777, 2], np.int32)[:, None], (QB, 128)
    ).copy()
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((QB, p), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray(x), jnp.asarray(ids0))
    ids = ids0.copy()
    acc = np.zeros((QB, p), np.float32)
    for _ in range(4):
        acc += x[ids[:, 0]]
        ids = (ids * 31 + 7) % n
    np.testing.assert_allclose(np.asarray(out), acc, rtol=1e-5)


# ---------------------------------------------------------------- d
@run("dma_while_loop_computed_argmin_ids")
def _():
    """Ids for the DMA come from an argmin over a carried float tile
    (the actual pop pattern)."""
    n, p = 5_000, 128

    def kernel(hbm_ref, est0_ref, ids0_ref, out_ref):
        def scoped(scratch, sem):
            def cond(carry):
                step, est, ids, acc = carry
                return step < 3

            def body(carry):
                step, est, ids, acc = carry
                m = jnp.min(est, axis=1, keepdims=True)
                lane = jax.lax.broadcasted_iota(jnp.int32, est.shape, 1)
                big = jnp.int32(2**30)
                pos = jnp.min(
                    jnp.where(est <= m, lane, big), axis=1, keepdims=True
                )
                pop = jnp.min(
                    jnp.where(lane == pos, ids, big), axis=1, keepdims=True
                )
                for q in range(QB):
                    pltpu.make_async_copy(
                        hbm_ref.at[pop[q, 0]], scratch.at[q], sem.at[q]
                    ).start()
                for q in range(QB):
                    pltpu.make_async_copy(
                        hbm_ref.at[pop[q, 0]], scratch.at[q], sem.at[q]
                    ).wait()
                rows = scratch[...]
                acc = acc + rows
                # retire the popped slot
                est = jnp.where(lane == pos, 3.4e38, est)
                return step + 1, est, ids, acc

            _, _, _, acc = jax.lax.while_loop(
                cond,
                body,
                (jnp.int32(0), est0_ref[...], ids0_ref[...],
                 jnp.zeros((QB, p), jnp.float32)),
            )
            out_ref[...] = acc

        pl.run_scoped(
            scoped,
            scratch=pltpu.VMEM((QB, p), jnp.float32),
            sem=pltpu.SemaphoreType.DMA((QB,)),
        )

    rng = np.random.default_rng(0)
    x = rng.standard_normal((n, p)).astype(np.float32)
    est0 = rng.standard_normal((QB, 128)).astype(np.float32)
    ids0 = rng.integers(0, n, (QB, 128)).astype(np.int32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((QB, p), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray(x), jnp.asarray(est0), jnp.asarray(ids0))
    est = est0.copy()
    acc = np.zeros((QB, p), np.float32)
    for _ in range(3):
        slot = est.argmin(1)
        acc += x[ids0[np.arange(QB), slot]]
        est[np.arange(QB), slot] = 3.4e38
    np.testing.assert_allclose(np.asarray(out), acc, rtol=1e-5)


# ---------------------------------------------------------------- e
@run("rerank_row_l2")
def _():
    """DMA'd raw row -> squared L2 against a per-query tile, as (QB, 1)."""

    def kernel(q_ref, v_ref, out_ref):
        q = q_ref[...]
        v = v_ref[...]
        d = q - v
        out_ref[...] = jnp.sum(d * d, axis=1, keepdims=True)

    rng = np.random.default_rng(0)
    qv = rng.standard_normal((QB, 128)).astype(np.float32)
    vv = rng.standard_normal((QB, 128)).astype(np.float32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((QB, 1), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray(qv), jnp.asarray(vv))
    np.testing.assert_allclose(
        np.asarray(out), ((qv - vv) ** 2).sum(1, keepdims=True), rtol=1e-5
    )


# ---------------------------------------------------------------- f
@run("grid_blocks_with_manual_dma")
def _():
    """grid=(2,) with VMEM-blocked ins/outs + an ANY HBM input DMA'd by
    dynamic ids — the megakernel's outer structure."""
    n, p = 2_000, 128

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
            out_ref[...] = scratch[...] * 2.0

        pl.run_scoped(
            body,
            scratch=pltpu.VMEM((QB, p), jnp.float32),
            sem=pltpu.SemaphoreType.DMA((QB,)),
        )

    rng = np.random.default_rng(0)
    x = rng.standard_normal((n, p)).astype(np.float32)
    idx = rng.integers(0, n, (2 * QB, 1)).astype(np.int32)
    out = pl.pallas_call(
        kernel,
        grid=(2,),
        out_shape=jax.ShapeDtypeStruct((2 * QB, p), jnp.float32),
        in_specs=[
            pl.BlockSpec(
                (QB, 1), lambda i: (i, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (QB, p), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
    )(jnp.asarray(idx), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), x[idx[:, 0]] * 2.0, rtol=1e-6)


# ---------------------------------------------------------------- g
@run("dma_row_2d_10x128_f32")
def _():
    """GIST-sized node block: (N, 10, 128) rows (8 plane sublanes + aux)."""
    n = 20_000

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
            s = scratch[...]
            out_ref[...] = s.sum(axis=1)

        pl.run_scoped(
            body,
            scratch=pltpu.VMEM((QB, 10, 128), jnp.float32),
            sem=pltpu.SemaphoreType.DMA((QB,)),
        )

    x = np.random.default_rng(0).standard_normal((n, 10, 128)).astype(
        np.float32
    )
    idx = np.array(
        [[3], [10_001], [0], [19_999], [5], [5], [7_777], [2]], np.int32
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((QB, 128), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray(idx), jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(out), x[idx[:, 0]].sum(1), rtol=1e-4, atol=1e-4
    )


print("\nSummary:")
for k, v in RESULTS.items():
    print(f"  {k}: {v}")
