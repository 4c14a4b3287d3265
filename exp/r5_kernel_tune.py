"""Round-5: fused-kernel grid tuning — per-step overhead (~9 us) is the
kernel's dominant cost, so sweep bn (rows/bins per block) and
dimension_semantics on the real chip.

Uses /tmp/idx100k_1bit.npz for fast iteration; reports kernel-only
device time at Q=2048 over the 100k store for each variant.
"""

import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from cphnsw_tpu import ScanIndex
from cphnsw_tpu.ops import hadamard, pack
from cphnsw_tpu.search import scan


def med(fn, reps=7):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def main():
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    idx = ScanIndex(128, bits=1).load("/tmp/idx100k_1bit.npz")
    arrays = idx._arrays
    signs = idx._signs
    aff_a, aff_b, n_dev = idx._dev_scalars
    n_pad, p = arrays.raw.shape
    Q = 2048
    rng = np.random.default_rng(0)
    q16 = rng.standard_normal((Q, 128)).astype(np.float16)
    q_dev = jax.device_put(q16)
    tiny = jax.jit(lambda a: jnp.sum(a[:1, :1].astype(jnp.float32)))
    np.asarray(tiny(q_dev))
    floor = med(lambda: np.asarray(tiny(q_dev)))
    print(f"floor {floor:.2f} ms  n_pad={n_pad}", flush=True)

    params_cls = getattr(pltpu, "CompilerParams", None) or getattr(
        pltpu, "TPUCompilerParams"
    )

    def run_variant(bins, bq, bn, dim_sem):
        groups = -(-n_pad // bins)
        rows_kpad = groups * bins
        planes_k = arrays.planes
        aux_k = arrays.node_aux
        if rows_kpad != n_pad:
            padr = rows_kpad - n_pad
            planes_k = jnp.pad(planes_k, ((0, padr), (0, 0), (0, 0)))
            aux_k = jnp.pad(aux_k, ((0, 0), (0, padr)))
            aux_k = aux_k.at[0, n_pad:].set(scan.PAD_SCORE)
        codes_i8 = pack.unpack_codes_i8(planes_k, p)
        codes_i8 = jax.device_put(np.asarray(codes_i8))
        aux_k = jax.device_put(np.asarray(aux_k))
        nb = bins // bn

        @jax.jit
        def keys_only(codes, aux, qr):
            qpad = hadamard.pad_to(qr.astype(jnp.float32), p)
            qc, w_fs, y_aux = scan._query_side(qpad, signs, aff_a, aff_b,
                                               1.0)
            kwargs = dict(compiler_params=params_cls(
                vmem_limit_bytes=100 * 1024 * 1024,
                dimension_semantics=dim_sem,
            )) if dim_sem is not None else dict(
                compiler_params=params_cls(
                    vmem_limit_bytes=100 * 1024 * 1024
                ))
            ms = pl.pallas_call(
                scan._fused_kernel,
                grid=(Q // bq, nb, groups),
                in_specs=[
                    pl.BlockSpec((bn, p), lambda qi, bj, gi: (gi * nb + bj, 0)),
                    pl.BlockSpec((6, bn), lambda qi, bj, gi: (0, gi * nb + bj)),
                    pl.BlockSpec((bq, p), lambda qi, bj, gi: (qi, 0)),
                    pl.BlockSpec((bq, 1), lambda qi, bj, gi: (qi, 0)),
                    pl.BlockSpec((bq, 5), lambda qi, bj, gi: (qi, 0)),
                ],
                out_specs=[
                    pl.BlockSpec((bq, bn), lambda qi, bj, gi: (qi, bj))
                    for _ in range(4)
                ],
                out_shape=[
                    jax.ShapeDtypeStruct((Q, bins), jnp.int32)
                    for _ in range(4)
                ],
                **kwargs,
            )(codes_i8, aux_k, qc.q_u.astype(jnp.int8), w_fs[:, None],
              y_aux)
            return sum(jnp.sum(m) for m in ms)

        steps = (Q // bq) * nb * groups
        ms_t = med(lambda: np.asarray(keys_only(codes_i8, aux_k, q_dev)))
        return ms_t - floor, steps

    sems = ("parallel", "arbitrary", "arbitrary")
    for bins, bq, bn, sem in (
        (1024, 256, 1024, None),
        (1024, 256, 1024, sems),
        (4096, 256, 4096, None),
        (4096, 256, 4096, sems),
        (8192, 256, 8192, None),
        (4096, 512, 4096, sems),
        (2048, 256, 2048, sems),
    ):
        try:
            t, steps = run_variant(bins, bq, bn, sem)
            print(f"bins={bins} bq={bq} bn={bn} sem={'y' if sem else 'n'}: "
                  f"{t:7.2f} ms  ({steps} steps, {t / steps * 1e3:.1f} "
                  f"us/step)", flush=True)
        except Exception as e:
            print(f"bins={bins} bq={bq} bn={bn}: FAIL {str(e)[:160]}",
                  flush=True)


if __name__ == "__main__":
    main()
