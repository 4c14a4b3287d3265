"""Where do the 50 ms of a Q=1024 ScanIndex batch go?

Times: (a) full search_batch (host->host), (b) scan_search on
device-resident queries, (c) upload alone, (d) fetch alone.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from cphnsw_tpu import ScanIndex
from cphnsw_tpu.search import scan
from cphnsw_tpu.utils.datasets import make_synthetic


def med(fn, reps=5):
    fn()  # warmup
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def main():
    n, dim, nq = 100_000, 128, 1024
    ds = make_synthetic(f"synthetic-{n // 1000}k-{dim}d", n_queries=nq)
    base, queries = ds["base"], ds["queries"]
    idx = ScanIndex(dim, bits=1).build(base).finalize()

    t_full = med(lambda: idx.search_batch(queries, k=10))
    print(f"full search_batch:     {t_full:7.1f} ms  "
          f"({nq / t_full * 1e3:.0f} qps)")

    q_dev = jax.device_put(queries)
    q_dev.block_until_ready()
    n_pad = idx._arrays.raw.shape[0]
    chunk, n_eq, rem = scan.chunk_plan(n_pad, nq)
    top_c = idx._budget.top_c(10, n)
    aff_a, aff_b, n_sc = idx._dev_scalars

    def dev_only():
        ids, d = scan.scan_search(
            idx._arrays, q_dev, idx._signs, aff_a, aff_b, n_sc,
            kappa=1.0, k=10, top_c=top_c, chunk=chunk, n_eq=n_eq, rem=rem,
        )
        ids.block_until_ready()

    print(f"device-resident scan:  {med(dev_only):7.1f} ms")

    def upload():
        jax.device_put(queries).block_until_ready()

    print(f"upload 1024x128 f32:   {med(upload):7.1f} ms")

    ids, d = scan.scan_search(
        idx._arrays, q_dev, idx._signs, aff_a, aff_b, n_sc,
        kappa=1.0, k=10, top_c=top_c, chunk=chunk, n_eq=n_eq, rem=rem,
    )

    def fetch():
        np.asarray(ids), np.asarray(d)

    print(f"fetch ids+dists:       {med(fetch):7.1f} ms")

    # scan minus selection: how much is approx_max_k?
    for tc, label in ((top_c, f"top_c={top_c}"), (32, "top_c=32")):
        def dev_tc():
            i2, _ = scan.scan_search(
                idx._arrays, q_dev, idx._signs, aff_a, aff_b, n_sc,
                kappa=1.0, k=10, top_c=tc, chunk=chunk, n_eq=n_eq, rem=rem,
            )
            i2.block_until_ready()
        print(f"device scan {label}:  {med(dev_tc):7.1f} ms")


if __name__ == "__main__":
    main()
