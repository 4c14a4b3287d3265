"""Round-5 headline attack: measure e2e variants of the Q=8192 serving
batch on 100k/128d/1-bit to find the fastest dispatch structure.

Variants:
  v0_current       : idx.search_batch (16x512 sub-batches, per-sub f16 upload)
  v1_single_call   : ONE scan_search at Q=8192 (fused kernel), one f16
                     upload, one packed fetch
  v2_slice_dispatch: one f16 upload of the full batch, then 16 jitted
                     slice+search programs on device slices, one packed fetch
  v3_single_f32    : v1 with f32 upload (wire dtype effect)
Isolated probes: upload-only (f16 full batch), compute-only (pre-staged
queries, v1 program), overlap test (2 uploads vs upload+dispatch+upload).

All timings end in a forcing fetch (block_until_ready is a no-op here).
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
from cphnsw_tpu.search import scan
from cphnsw_tpu.utils.datasets import make_synthetic
from cphnsw_tpu.utils.eval import recall_at_k


def med(fn, reps=5):
    fn()  # warmup/compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def main():
    n, dim, bits, k, nq = 100_000, 128, 1, 10, 8192
    ds = make_synthetic(f"synthetic-{n // 1000}k-{dim}d", n_queries=nq)
    queries, gt = ds["queries"], ds["groundtruth"]
    t0 = time.perf_counter()
    idx = ScanIndex(dim, bits=bits).build(ds["base"]).finalize()
    print(f"build {time.perf_counter() - t0:.1f}s", flush=True)

    arrays = idx._arrays
    aff_a, aff_b, n_dev = idx._dev_scalars
    signs = idx._signs
    kappa = float((1 << bits) - 1)
    n_pad = arrays.raw.shape[0]
    top_c = idx._budget.top_c(k, n)
    chunk_full, n_eq_full, rem_full = scan.chunk_plan(n_pad, nq)
    print(f"top_c={top_c} chunk_full={chunk_full} n_eq={n_eq_full} "
          f"rem={rem_full}", flush=True)

    q16 = queries.astype(np.float16)
    out = {"n": n, "dim": dim, "bits": bits, "nq": nq, "top_c": top_c,
           "variants_ms": {}, "qps": {}}

    # ---- v0: current production path
    out["variants_ms"]["v0_current"] = med(
        lambda: idx.search_batch(queries, k=k))
    ids0, _ = idx.search_batch(queries, k=k)
    out["recall_v0"] = recall_at_k(np.asarray(ids0), gt.astype(np.int64), k)

    # ---- isolated: upload only (f16 full batch)
    tiny = jax.jit(lambda a: jnp.sum(a[:1, :1].astype(jnp.float32)))

    def up16():
        d = jax.device_put(q16)
        np.asarray(tiny(d))
    out["variants_ms"]["upload_f16_full"] = med(up16)

    def up32():
        d = jax.device_put(queries)
        np.asarray(tiny(d))
    out["variants_ms"]["upload_f32_full"] = med(up32)

    out["variants_ms"]["floor"] = med(
        lambda: np.asarray(tiny(jnp.zeros((2, 2), jnp.float16))))

    # ---- v1: single call, fused kernel, whole batch
    def fetch_packed(ids_d, d_d):
        packed = jnp.stack(
            [ids_d, jax.lax.bitcast_convert_type(d_d, jnp.int32)], 0)
        return np.asarray(packed)

    def v1():
        q_dev = jax.device_put(q16)
        ids_d, d_d = scan.scan_search(
            arrays, q_dev, signs, aff_a, aff_b, n_dev, kappa=kappa,
            k=k, top_c=top_c, chunk=chunk_full, n_eq=n_eq_full,
            rem=rem_full, fused=True)
        return fetch_packed(ids_d, d_d)
    out["variants_ms"]["v1_single_call"] = med(v1)
    packed1 = v1()
    out["recall_v1"] = recall_at_k(
        packed1[0].astype(np.int64), gt.astype(np.int64), k)

    # compute-only: queries pre-staged on device
    q_dev_persist = jax.device_put(q16)
    np.asarray(tiny(q_dev_persist))

    def v1_compute():
        ids_d, d_d = scan.scan_search(
            arrays, q_dev_persist, signs, aff_a, aff_b, n_dev, kappa=kappa,
            k=k, top_c=top_c, chunk=chunk_full, n_eq=n_eq_full,
            rem=rem_full, fused=True)
        return fetch_packed(ids_d, d_d)
    out["variants_ms"]["v1_compute_only"] = med(v1_compute)

    # ---- v3: f32 wire single call
    def v3():
        q_dev = jax.device_put(queries)
        ids_d, d_d = scan.scan_search(
            arrays, q_dev, signs, aff_a, aff_b, n_dev, kappa=kappa,
            k=k, top_c=top_c, chunk=chunk_full, n_eq=n_eq_full,
            rem=rem_full, fused=True)
        return fetch_packed(ids_d, d_d)
    out["variants_ms"]["v3_single_f32"] = med(v3)

    # ---- v2: one upload, sliced sub-batch dispatches
    SUB = 512
    chunk_s, n_eq_s, rem_s = scan.chunk_plan(n_pad, SUB)

    @partial(jax.jit, static_argnames=("sub", "k", "top_c", "chunk",
                                       "n_eq", "rem"))
    def slice_search(arrays, q_all, start, signs, aff_a, aff_b, n_dev,
                     sub, k, top_c, chunk, n_eq, rem):
        q = jax.lax.dynamic_slice_in_dim(q_all, start, sub, axis=0)
        return scan.scan_search(
            arrays, q, signs, aff_a, aff_b, n_dev, kappa=kappa,
            k=k, top_c=top_c, chunk=chunk, n_eq=n_eq, rem=rem, fused=True)

    def v2():
        q_all = jax.device_put(q16)
        outs = []
        for s in range(0, nq, SUB):
            outs.append(slice_search(
                arrays, q_all, jnp.int32(s), signs, aff_a, aff_b, n_dev,
                sub=SUB, k=k, top_c=top_c, chunk=chunk_s, n_eq=n_eq_s,
                rem=rem_s))
        packed = jnp.concatenate(
            [jnp.stack([i, jax.lax.bitcast_convert_type(d, jnp.int32)], 0)
             for i, d in outs], axis=1)
        return np.asarray(packed)
    out["variants_ms"]["v2_slice_dispatch"] = med(v2)

    # ---- overlap probe: does upload overlap compute?
    halves = [jax.device_put(q16[:4096]), None]

    def two_uploads():
        a = jax.device_put(q16[:4096])
        b = jax.device_put(q16[4096:])
        np.asarray(tiny(a) + tiny(b))
    out["variants_ms"]["two_half_uploads"] = med(two_uploads)

    def upload_dispatch_upload():
        a = jax.device_put(q16[:4096])
        ids_d, d_d = scan.scan_search(
            arrays, a, signs, aff_a, aff_b, n_dev, kappa=kappa,
            k=k, top_c=top_c, chunk=chunk_full, n_eq=n_eq_full,
            rem=rem_full, fused=True)
        b = jax.device_put(q16[4096:])
        ids2, d2 = scan.scan_search(
            arrays, b, signs, aff_a, aff_b, n_dev, kappa=kappa,
            k=k, top_c=top_c, chunk=chunk_full, n_eq=n_eq_full,
            rem=rem_full, fused=True)
        packed = jnp.stack(
            [jnp.concatenate([ids_d, ids2], 0),
             jax.lax.bitcast_convert_type(
                 jnp.concatenate([d_d, d2], 0), jnp.int32)], 0)
        return np.asarray(packed)
    out["variants_ms"]["v4_two_half_calls"] = med(upload_dispatch_upload)

    for name, ms in out["variants_ms"].items():
        out["qps"][name] = round(nq / (ms / 1e3))
        print(f"{name:24s} {ms:8.2f} ms  ({out['qps'][name]} qps)",
              flush=True)
    print(f"recall v0={out['recall_v0']:.4f} v1={out['recall_v1']:.4f}")

    res = Path(__file__).parent.parent / "results"
    fn = res / "r5_headline_variants.json"
    fn.write_text(json.dumps(out, indent=1))
    print(f"wrote {fn}")


if __name__ == "__main__":
    main()
