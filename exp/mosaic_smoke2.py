"""Mosaic smoke tests round 2: disambiguate round-1 failures."""

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
        wrapper()
    return deco


# ---------------------------------------------------------------- a
@run("middle_dim_value_slice_32lane")
def _():
    """v[:, c, :] on a (QB, 6, 32) VMEM *value* (no DMA involved)."""

    def kernel(x_ref, out_ref):
        v = x_ref[...]
        out_ref[...] = v[:, 2, :] + v[:, 5, :]

    x = np.random.default_rng(0).standard_normal((QB, 6, 32)).astype(
        np.float32
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((QB, 32), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), x[:, 2] + x[:, 5], rtol=1e-6)


# ---------------------------------------------------------------- b
@run("hbm_dma_6x32_block")
def _():
    """DMA aux (6, 32) row from a large, genuinely HBM-resident array."""
    n = 200_000

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
            out_ref[...] = s[:, 2, :] + s[:, 5, :]

        pl.run_scoped(
            body,
            scratch=pltpu.VMEM((QB, 6, 32), jnp.float32),
            sem=pltpu.SemaphoreType.DMA((QB,)),
        )

    x = np.random.default_rng(0).standard_normal((n, 6, 32)).astype(
        np.float32
    )
    idx = np.array(
        [[3], [100_001], [0], [199_999], [5], [5], [77_777], [2]], np.int32
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((QB, 32), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray(idx), jnp.asarray(x))
    want = x[idx[:, 0], 2] + x[idx[:, 0], 5]
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-6)


# ---------------------------------------------------------------- c
@run("roll_insert_loop_fori_nocumsum")
def _():
    """Worst-replacement insert with min-lane-index tiebreak (no cumsum)."""

    def kernel(beam_ref, cand_ref, out_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (QB, 128), 1)

        def body(c, carry):
            beam, cand = carry
            val = cand[:, 0:1]
            worst = jnp.max(beam, axis=1, keepdims=True)
            at_worst = beam >= worst
            first = jnp.min(
                jnp.where(at_worst, lane, 128), axis=1, keepdims=True
            )
            replace = (val < worst) & (lane == first)
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
    b = beam.copy()
    for c in range(32):
        v = cand[:, c]
        w = b.argmax(1)
        repl = v < b[np.arange(QB), w]
        b[np.arange(QB)[repl], w[repl]] = v[repl]
    np.testing.assert_allclose(np.asarray(out), b, rtol=1e-6)


# ---------------------------------------------------------------- d
@run("lane_roll_channel_extract")
def _():
    """Extract 32-lane channel chunks from a packed 128-lane row via roll."""

    def kernel(x_ref, out_ref):
        x = x_ref[...]                            # (QB, 128)
        c1 = pltpu.roll(x, -32, 1)
        c2 = pltpu.roll(x, -64, 1)
        out_ref[...] = (x + c1 * c2)[:, :]

    x = np.random.default_rng(0).standard_normal((QB, 128)).astype(
        np.float32
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((QB, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray(x))
    want = x + np.roll(x, -32, 1) * np.roll(x, -64, 1)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-5)


# ---------------------------------------------------------------- e
@run("scratch_ref_sublane_block_write")
def _():
    """Write a (QB, 128) value into a static sublane block of a larger
    scratch ref, read back a different block."""

    def kernel(x_ref, out_ref):
        def body(scratch):
            scratch[0:QB, :] = x_ref[...] * 2.0
            scratch[QB : 2 * QB, :] = x_ref[...] + 1.0
            out_ref[...] = scratch[0:QB, :] + scratch[QB : 2 * QB, :]

        pl.run_scoped(body, pltpu.VMEM((4 * QB, 128), jnp.float32))

    x = np.random.default_rng(0).standard_normal((QB, 128)).astype(
        np.float32
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((QB, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), x * 3.0 + 1.0, rtol=1e-6)


# ---------------------------------------------------------------- f
@run("dma_wide_row_320_lanes")
def _():
    """DMA a (1, 320)-lane row (planes+aux fused, non-128-multiple width)
    from HBM, then slice the 128-aligned prefix."""
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
            s = scratch[...]
            out_ref[...] = s[:, 0:128]

        pl.run_scoped(
            body,
            scratch=pltpu.VMEM((QB, 320), jnp.float32),
            sem=pltpu.SemaphoreType.DMA((QB,)),
        )

    x = np.random.default_rng(0).standard_normal((n, 320)).astype(np.float32)
    idx = np.array(
        [[3], [50_001], [0], [99_999], [5], [5], [7_777], [2]], np.int32
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((QB, 128), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray(idx), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), x[idx[:, 0], :128], rtol=1e-6)


# ---------------------------------------------------------------- g
@run("batched_matvec_dot_general")
def _():
    """fs via batched dot_general: (QB, 32, 128) x (QB, 128) -> (QB, 32)."""

    def kernel(a_ref, b_ref, out_ref):
        out_ref[...] = jax.lax.dot_general(
            a_ref[...],
            b_ref[...],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    rng = np.random.default_rng(0)
    a = rng.standard_normal((QB, 32, 128)).astype(np.float32)
    b = rng.standard_normal((QB, 128)).astype(np.float32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((QB, 32), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray(a), jnp.asarray(b))
    want = np.einsum("qcd,qd->qc", a, b).astype(np.float32)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-4)


# ---------------------------------------------------------------- h
@run("int32_mod_and_compare")
def _():
    """id % H and integer compares (hash-style ops) on (QB, 32) tiles."""

    def kernel(x_ref, out_ref):
        x = x_ref[...]
        out_ref[...] = jnp.where((x % 8192) > 4096, x, -x)

    x = np.random.default_rng(0).integers(0, 10**6, (QB, 32)).astype(
        np.int32
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((QB, 32), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray(x))
    want = np.where((x % 8192) > 4096, x, -x)
    np.testing.assert_allclose(np.asarray(out), want)


print("\nSummary:")
for k, v in RESULTS.items():
    print(f"  {k}: {v}")
