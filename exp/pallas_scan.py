"""Bench driver for the PRODUCTION fused Pallas scan+select kernel
(search/scan.py:_fused_kernel via fused_scan_keys) against the XLA
binned-reduce reference.

Kernel history: a first u32-key version failed Mosaic legalization
('arith.minui' -- TPU has no unsigned vector min); the production kernel
keeps keys in SIGNED int32 with the signed monotone float encoding and
maps bit-exactly onto the u32 convention outside (see scan.py).

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


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    q = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
    interpret = len(sys.argv) > 4 and sys.argv[4] == "interpret"
    if interpret:
        jax.config.update("jax_platforms", "cpu")

    from cphnsw_tpu.search import scan

    top_c = 384
    bins, groups, rows_pad = scan.fused_bin_plan(scan.store_pad(n), top_c)
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 2, size=(rows_pad, dim)).astype(np.int8)
    aux = rng.standard_normal((6, rows_pad)).astype(np.float32)
    aux[0, n:] = scan.PAD_SCORE
    qs = rng.integers(0, 16, size=(q, dim)).astype(np.int8)
    wfs = rng.standard_normal(q).astype(np.float32)
    yaux = rng.standard_normal((q, 5)).astype(np.float32)
    args = [jnp.asarray(x) for x in (codes, aux, qs, wfs, yaux)]

    fused = jax.jit(
        functools.partial(scan.fused_scan_keys, bins=bins,
                          interpret=interpret)
    )

    def xla_ref(codes_i8, node_aux, q_u_i8, w_fs, y_aux):
        g = rows_pad // bins
        fs = q_u_i8.astype(jnp.int32) @ codes_i8.astype(jnp.int32).T
        score = (w_fs[:, None] * node_aux[5][None, :]) * fs.astype(
            jnp.float32
        )
        for a in range(5):
            score = score + y_aux[:, a][:, None] * node_aux[a][None, :]
        return scan._binned_keys(score, g, bins)

    k1 = np.asarray(fused(*args))
    k2 = np.asarray(jax.jit(xla_ref)(*args))
    eq = (k1 == k2).mean()
    print(f"kernel/XLA key equality: {eq:.5f} (1-ulp FMA diffs expected)")
    assert eq > 0.999

    if not interpret:
        def bench(fn, label):
            np.asarray(fn(*args)[:1, :1])
            ts = []
            for _ in range(7):
                t0 = time.perf_counter()
                out = fn(*args)
                np.asarray(out[:2, :2])
                ts.append(time.perf_counter() - t0)
            print(f"{label}: {np.median(ts)*1e3:8.2f} ms")

        bench(fused, "pallas fused keys")
        bench(jax.jit(xla_ref), "xla binned keys ")


if __name__ == "__main__":
    main()
