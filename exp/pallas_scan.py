"""Pallas fused scan+select kernel: score every row and reduce top-2
bin keys in ONE pass, never materializing any (Q, N) buffer.

The XLA scan path materializes fs (int32), the f32 score, and reads it
twice for the two binned-min reduces — ~4 HBM round trips over a
(Q, N)-sized buffer.  This kernel keeps the (bq, bn) score tile in VMEM
and writes only the (Q, 2*bins) packed keys, so the HBM traffic is the
int8 codes once plus the tiny outputs: at 1M x 128d x Q=1024 that is
~130 MB instead of ~4 GB.

Layout: rows of the (padded) store are assigned bin = row % bins,
group = row // bins (same mapping as search/scan._binned_keys).  Grid is
(Q/bq, bins/bn, groups); the group axis iterates innermost so the output
key block stays resident in VMEM while every group's candidate for those
bins streams through.

Usage: python exp/pallas_scan.py [n] [dim] [q] [interpret]
"""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

GROUP_BITS = 10
GROUP_MASK = (1 << GROUP_BITS) - 1
# numpy scalars: Pallas kernels cannot close over traced jnp constants
SIGN_U32 = np.uint32(0x80000000)
NOT_GROUP = np.uint32(0xFFFFFFFF ^ GROUP_MASK)
KEY_MAX = np.uint32(0xFFFFFFFF)


def _kernel(codes_ref, aux_ref, q_ref, wfs_ref, yaux_ref, m1_ref, m2_ref):
    gi = pl.program_id(2)

    fs = jax.lax.dot_general(
        q_ref[:],                       # (bq, P) int8
        codes_ref[:],                   # (bn, P) int8
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )                                    # (bq, bn)
    g_c = aux_ref[5, :]                  # (bn,)
    score = (wfs_ref[:] * g_c[None, :]) * fs.astype(jnp.float32)
    for a in range(5):
        score = score + yaux_ref[:, a][:, None] * aux_ref[a, :][None, :]

    u = jax.lax.bitcast_convert_type(score, jnp.uint32)
    key = jnp.where((u & SIGN_U32) != 0, ~u, u | SIGN_U32)
    key = (key & NOT_GROUP) | gi.astype(jnp.uint32)

    @pl.when(gi == 0)
    def _():
        m1_ref[:] = jnp.full_like(m1_ref, KEY_MAX)
        m2_ref[:] = jnp.full_like(m2_ref, KEY_MAX)

    m1_old = m1_ref[:]
    m1_ref[:] = jnp.minimum(m1_old, key)
    m2_ref[:] = jnp.minimum(m2_ref[:], jnp.maximum(m1_old, key))


@functools.partial(
    jax.jit, static_argnames=("bins", "bq", "bn", "interpret")
)
def fused_scan_keys(
    codes_i8,      # (rows_pad, P) int8, rows_pad = g * bins
    node_aux,      # (6, rows_pad) f32, pad rows carry PAD score in row 0
    q_u_i8,        # (Q, P) int8
    w_fs,          # (Q,) f32
    y_aux,         # (Q, 5) f32
    bins: int,
    bq: int = 256,
    bn: int = 512,
    interpret: bool = False,
):
    rows_pad, p = codes_i8.shape
    q = q_u_i8.shape[0]
    assert rows_pad % bins == 0 and bins % bn == 0 and q % bq == 0
    groups = rows_pad // bins
    assert groups <= (1 << GROUP_BITS)

    # aux rows laid out (6, groups, bins) -> block (6, bn) per (bj, gi)
    grid = (q // bq, bins // bn, groups)
    nb = bins // bn

    m1, m2 = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bn, p), lambda qi, bj, gi: (gi * nb + bj, 0)),
            pl.BlockSpec((6, bn), lambda qi, bj, gi: (0, gi * nb + bj)),
            pl.BlockSpec((bq, p), lambda qi, bj, gi: (qi, 0)),
            pl.BlockSpec((bq, 1), lambda qi, bj, gi: (qi, 0)),
            pl.BlockSpec((bq, 5), lambda qi, bj, gi: (qi, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bq, bn), lambda qi, bj, gi: (qi, bj)),
            pl.BlockSpec((bq, bn), lambda qi, bj, gi: (qi, bj)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((q, bins), jnp.uint32),
            jax.ShapeDtypeStruct((q, bins), jnp.uint32),
        ],
        interpret=interpret,
    )(codes_i8, node_aux, q_u_i8, w_fs[:, None], y_aux)
    return m1, m2


def reference_keys(codes_i8, node_aux, q_u_i8, w_fs, y_aux, bins):
    """Same reduction in plain XLA for correctness checking."""
    rows_pad, p = codes_i8.shape
    g = rows_pad // bins
    fs = q_u_i8.astype(jnp.int32) @ codes_i8.astype(jnp.int32).T
    score = (w_fs[:, None] * node_aux[5][None, :]) * fs.astype(jnp.float32)
    for a in range(5):
        score = score + y_aux[:, a][:, None] * node_aux[a][None, :]
    u = jax.lax.bitcast_convert_type(score, jnp.uint32)
    key = jnp.where((u & SIGN_U32) != 0, ~u, u | SIGN_U32)
    gidx = jax.lax.broadcasted_iota(
        jnp.uint32, (key.shape[0], g, bins), 1
    )
    key = (key.reshape(key.shape[0], g, bins) & NOT_GROUP) | gidx
    m1 = jnp.min(key, axis=1)
    m2 = jnp.min(
        jnp.where(key == m1[:, None, :], KEY_MAX, key), axis=1
    )
    return m1, m2


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    q = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
    interpret = len(sys.argv) > 4 and sys.argv[4] == "interpret"
    if interpret:
        jax.config.update("jax_platforms", "cpu")

    bins = 4096
    rows_pad = -(-n // bins) * bins
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 2, size=(rows_pad, dim)).astype(np.int8)
    aux = rng.standard_normal((6, rows_pad)).astype(np.float32)
    aux[0, n:] = 1e30  # pad rows rank last
    qs = rng.integers(0, 16, size=(q, dim)).astype(np.int8)
    wfs = rng.standard_normal(q).astype(np.float32)
    yaux = rng.standard_normal((q, 5)).astype(np.float32)

    args = [jnp.asarray(x) for x in (codes, aux, qs, wfs, yaux)]

    if interpret or n <= 200_000:
        m1, m2 = fused_scan_keys(*args, bins=bins, interpret=interpret)
        r1, r2 = reference_keys(*args, bins=bins)
        # scores differ by ~1 ulp (kernel FMA order); require key equality
        # for >=99.9% of bins — selection is approximate by design
        eq1 = (np.asarray(m1) == np.asarray(r1)).mean()
        eq2 = (np.asarray(m2) == np.asarray(r2)).mean()
        print(f"key equality: m1 {eq1:.5f}, m2 {eq2:.5f}")
        assert eq1 > 0.999 and eq2 > 0.999

    if not interpret:
        def bench(fn, label):
            out = fn()
            np.asarray(out[0][:1, :1])
            ts = []
            for _ in range(7):
                t0 = time.perf_counter()
                out = fn()
                s = np.asarray(out[0][:2, :2])
                ts.append(time.perf_counter() - t0)
            print(f"{label}: {np.median(ts)*1e3:8.2f} ms")

        bench(lambda: fused_scan_keys(*args, bins=bins), "pallas fused")
        if n <= 1_100_000:
            rj = jax.jit(functools.partial(reference_keys, bins=bins))
            bench(lambda: rj(*args), "xla reference")


if __name__ == "__main__":
    main()
