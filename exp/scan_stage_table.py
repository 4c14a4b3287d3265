"""Per-stage device-time table for one ScanIndex search step.

IMPORTANT measurement note (this backend): on the axon remote platform
`block_until_ready()` does NOT synchronize — only a real device->host
fetch does.  Every probe therefore ends in a tiny np.asarray() fetch of
an output that DEPENDS on the full stage (a cheap jnp.sum, never a
slice, so XLA cannot dead-code the work away).  Stage costs are
differences of cumulative probes; the floor probe (trivial jit + fetch)
is the dispatch+RTT+fetch overhead every probe shares.  The tunnel RTT
varies 25-45 ms between calls, so treat small deltas as noise — the
isolated probes (rerank_only, final_select_only) are the trustworthy
per-stage numbers.

Writes results/scan_stage_profile_<n>_<dim>_<bits>.json and prints the
table.

Usage: python exp/scan_stage_table.py [n_rows] [dim] [bits]
"""

import json
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from cphnsw_tpu import ScanIndex
from cphnsw_tpu.ops import hadamard
from cphnsw_tpu.search import scan
from cphnsw_tpu.utils.datasets import make_synthetic


def med(fn, reps=7):
    fn()  # warmup/compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    bits = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    k = 10
    ds = make_synthetic(f"synthetic-{n // 1000}k-{dim}d", n_queries=8192)
    t0 = time.perf_counter()
    idx = ScanIndex(dim, bits=bits).build(ds["base"]).finalize()
    build_s = time.perf_counter() - t0
    arrays = idx._arrays
    aff_a, aff_b, n_dev = idx._dev_scalars
    p = arrays.raw.shape[1]
    n_pad = arrays.raw.shape[0]
    kappa = float((1 << bits) - 1)
    signs = idx._signs

    out = {"n": n, "dim": dim, "bits": bits, "build_s": round(build_s, 1),
           "device": jax.devices()[0].platform, "stages_ms": {}}

    for nq in (1024, 8192):
        queries = ds["queries"][:nq]
        chunk, n_eq, rem = scan.chunk_plan(n_pad, nq)
        top_c = idx._budget.top_c(k, n)
        q_dev = jax.device_put(queries)
        np.asarray(jax.jit(jnp.sum)(q_dev))  # settle upload

        stages = {}
        tiny = jax.jit(lambda a: jnp.sum(a[:1, :1]))
        stages["floor_dispatch_fetch"] = med(lambda: np.asarray(tiny(q_dev)))

        def up():
            d = jax.device_put(queries)
            np.asarray(tiny(d))
        stages["upload_queries_f32"] = med(up)

        q16 = queries.astype(np.float16)

        def up16():
            d = jax.device_put(q16)
            np.asarray(jax.jit(lambda a: jnp.sum(a[:1, :1]))(d))
        stages["upload_queries_f16"] = med(up16)

        def prep(qr):
            qpad = hadamard.pad_to(qr.astype(jnp.float32), p)
            qc, w_fs, y_aux = scan._query_side(qpad, signs, aff_a, aff_b,
                                               kappa)
            return qpad, qc.q_u.astype(jnp.int8), w_fs, y_aux

        def all_scores(q_u_i8, w_fs, y_aux, f_reduce):
            acc = None
            for start in range(0, n_pad, chunk):
                size = min(chunk, n_pad - start)
                planes_c = jax.lax.slice_in_dim(arrays.planes, start,
                                                start + size, axis=0)
                aux_c = jax.lax.slice_in_dim(arrays.node_aux, start,
                                             start + size, axis=1)
                s = scan._chunk_scores(planes_c, aux_c, q_u_i8, w_fs,
                                       y_aux, p)
                r = f_reduce(s, start, size)
                acc = r if acc is None else acc + r
            return acc

        @jax.jit
        def score_sum(qr):
            _, q_u_i8, w_fs, y_aux = prep(qr)
            return all_scores(q_u_i8, w_fs, y_aux,
                              lambda s, st, sz: jnp.sum(s))

        stages["cum_scores"] = med(lambda: np.asarray(score_sum(q_dev)))

        total_chunks = n_eq + (1 if rem else 0)
        want_c = -(-max(scan.BINS_MIN, scan.BIN_FACTOR * top_c)
                   // total_chunks)

        @jax.jit
        def keys_sum(qr):
            _, q_u_i8, w_fs, y_aux = prep(qr)

            def kr(s, st, sz):
                g, bins = scan._bin_plan(sz, want_c)
                return jnp.sum(
                    scan._binned_keys(s, g, bins).astype(jnp.int64)
                )
            return all_scores(q_u_i8, w_fs, y_aux, kr)

        stages["cum_binned_keys"] = med(lambda: np.asarray(keys_sum(q_dev)))

        # isolated probes (trustworthy stage costs) -------------------
        rng = np.random.default_rng(0)
        cand = jax.device_put(
            rng.integers(0, n, size=(nq, top_c)).astype(np.int32))

        @jax.jit
        def rerank_sum(qr, cand):
            qpad = hadamard.pad_to(qr.astype(jnp.float32), p)
            qnorm = jnp.sum(qpad * qpad, -1)
            ids, d = scan._rerank(arrays.raw, arrays.norm_sq, qpad, qnorm,
                                  cand, n_dev, k)
            return jnp.sum(ids) + jnp.sum(jnp.where(d < 1e30, d, 0.0))

        fl = stages["floor_dispatch_fetch"]
        stages["isolated_rerank"] = med(
            lambda: np.asarray(rerank_sum(q_dev, cand))) - fl

        g_eq, bins_eq = scan._bin_plan(chunk, want_c)
        w_tot = (bins_eq * (1 if g_eq == 1 else 2)) * n_eq
        if rem:
            g_r, bins_r = scan._bin_plan(rem, want_c)
            w_tot += bins_r * (1 if g_r == 1 else 2)
        keys_rand = jax.device_put(
            rng.integers(0, 2**32, size=(nq, w_tot), dtype=np.uint32))
        bin_base = jnp.asarray(rng.integers(0, n, w_tot, dtype=np.int32))
        bin_stride = jnp.asarray(np.full(w_tot, bins_eq, np.int32))

        @jax.jit
        def select_sum(keys):
            cand = scan._decode_keys(keys, bin_base, bin_stride, top_c)
            return jnp.sum(cand)

        stages["isolated_final_select"] = med(
            lambda: np.asarray(select_sum(keys_rand))) - fl

        def full():
            ids, d = scan.scan_search(
                arrays, q_dev, signs, aff_a, aff_b, n_dev, kappa=kappa,
                k=k, top_c=min(top_c, chunk), chunk=chunk, n_eq=n_eq,
                rem=rem)
            np.asarray(ids)
        stages["cum_full_search"] = med(full)

        stages["e2e_search_batch"] = med(
            lambda: idx.search_batch(queries, k=k))

        out["stages_ms"][f"Q{nq}"] = {
            "top_c": top_c, "chunk": chunk, "n_eq": n_eq, "rem": rem,
            "total_bins": w_tot,
            "raw": {s: round(v, 2) for s, v in stages.items()},
            "qps_e2e": round(nq / (stages["e2e_search_batch"] / 1e3)),
        }
        print(f"--- Q={nq} (top_c={top_c}, bins={w_tot}) ---")
        for s, v in stages.items():
            print(f"  {s:24s} {v:8.2f} ms")
        print(f"  e2e qps: {out['stages_ms'][f'Q{nq}']['qps_e2e']}",
              flush=True)

    res = Path(__file__).parent.parent / "results"
    res.mkdir(exist_ok=True)
    fn = res / f"scan_stage_profile_{n // 1000}k_{dim}d_{bits}bit.json"
    fn.write_text(json.dumps(out, indent=1))
    print(f"wrote {fn}")


if __name__ == "__main__":
    main()
