"""Mosaic smoke tests round 3: lane sub-slicing, padding, fixed rolls."""

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
                print(f"[FAIL] {name}: {str(e)[:200]}", flush=True)
        wrapper()
    return deco


# ---------------------------------------------------------------- i
@run("unaligned_value_lane_slice")
def _():
    def kernel(x_ref, out_ref):
        x = x_ref[...]                            # (QB, 256)
        out_ref[...] = x[:, 32:64] * x[:, 64:96]

    x = np.random.default_rng(0).standard_normal((QB, 256)).astype(
        np.float32
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((QB, 32), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(out), x[:, 32:64] * x[:, 64:96], rtol=1e-6
    )


# ---------------------------------------------------------------- ii
@run("lane_pad_32_to_128")
def _():
    def kernel(x_ref, out_ref):
        x = x_ref[...]                            # (QB, 32)
        out_ref[...] = jnp.pad(x, ((0, 0), (0, 96)))

    x = np.random.default_rng(0).standard_normal((QB, 32)).astype(np.float32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((QB, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(out), np.pad(x, ((0, 0), (0, 96))), rtol=1e-6
    )


# ---------------------------------------------------------------- iii
@run("concat_32lane_chunks")
def _():
    def kernel(x_ref, out_ref):
        x = x_ref[...]                            # (QB, 32)
        out_ref[...] = jnp.concatenate([x, x * 2, x * 3, x * 4], axis=1)

    x = np.random.default_rng(0).standard_normal((QB, 32)).astype(np.float32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((QB, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray(x))
    want = np.concatenate([x, x * 2, x * 3, x * 4], axis=1)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-6)


# ---------------------------------------------------------------- iv
@run("roll_insert_fori_positive")
def _():
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
            cand = pltpu.roll(cand, 31, 1)        # == roll by -1 on 32 lanes
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


# ---------------------------------------------------------------- v
@run("combined_row_dma_256")
def _():
    """The megakernel gather: (N, 256) row DMA by computed scalar ->
    planes half [0:128], aux half [128:256], channel extract."""
    n = 150_000

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
            s = scratch[...]                      # (QB, 256)
            planes = s[:, 0:128]
            aux = s[:, 128:256]
            nop = aux[:, 32:64]
            qo = aux[:, 64:96]
            out_ref[...] = planes[:, 0:32] + nop * qo

        pl.run_scoped(
            body,
            scratch=pltpu.VMEM((QB, 256), jnp.float32),
            sem=pltpu.SemaphoreType.DMA((QB,)),
        )

    x = np.random.default_rng(0).standard_normal((n, 256)).astype(np.float32)
    idx = np.array(
        [[3], [100_001], [0], [149_999], [5], [5], [7_777], [2]], np.int32
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((QB, 32), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray(idx), jnp.asarray(x))
    r = x[idx[:, 0]]
    want = r[:, 0:32] + r[:, 160:192] * r[:, 192:224]
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-5)


# ---------------------------------------------------------------- vi
@run("scratch_block_write_diagnose")
def _():
    """Round-2 'e' failed numerically; isolate with distinct buffers."""

    def kernel(x_ref, out_ref):
        def body(s1, s2):
            s1[...] = x_ref[...] * 2.0
            s2[...] = x_ref[...] + 1.0
            out_ref[...] = s1[...] + s2[...]

        pl.run_scoped(
            body,
            pltpu.VMEM((QB, 128), jnp.float32),
            pltpu.VMEM((QB, 128), jnp.float32),
        )

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


# ---------------------------------------------------------------- vii
@run("int32_bitcast_from_f32_tile")
def _():
    """ids arrive as f32-bitcast lanes in the fused row; recover int32."""

    def kernel(x_ref, out_ref):
        x = x_ref[...]                            # (QB, 128) f32 (bitcast)
        out_ref[...] = pltpu.bitcast(x, jnp.int32) + 1

    ids = np.random.default_rng(0).integers(0, 10**6, (QB, 128)).astype(
        np.int32
    )
    x = ids.view(np.float32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((QB, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ids + 1)


print("\nSummary:")
for k, v in RESULTS.items():
    print(f"  {k}: {v}")
