"""Round-5: per-stage device time of ONE 512-query sub-batch (the v0
production unit) + sub-batch size sweep with the current structure.

Builds (or loads from /tmp/idx100k_1bit.npz) the 100k/128d/1-bit index.
Stages at Q=512, pre-staged queries, forcing fetches, floor-subtracted:
  keys   : fused_scan_keys only
  decode : keys + _decode_keys (the top_c top_k)
  full   : scan_search (keys + decode + rerank)
Then e2e search_batch sweep over SEARCH_SUB_BATCH in {128..2048}.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from cphnsw_tpu import ScanIndex
from cphnsw_tpu.api import scan_index as scan_index_mod
from cphnsw_tpu.ops import hadamard, pack
from cphnsw_tpu.search import scan
from cphnsw_tpu.utils.datasets import make_synthetic
from cphnsw_tpu.utils.eval import recall_at_k

IDX_FILE = Path("/tmp/idx100k_1bit.npz")


def med(fn, reps=5):
    fn()
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

    idx = ScanIndex(dim, bits=bits)
    if IDX_FILE.exists():
        t0 = time.perf_counter()
        idx.load(IDX_FILE)
        print(f"load {time.perf_counter() - t0:.1f}s", flush=True)
    else:
        t0 = time.perf_counter()
        idx.build(ds["base"]).finalize()
        print(f"build {time.perf_counter() - t0:.1f}s", flush=True)
        idx.save(IDX_FILE)

    arrays = idx._arrays
    aff_a, aff_b, n_dev = idx._dev_scalars
    signs = idx._signs
    kappa = float((1 << bits) - 1)
    n_pad = arrays.raw.shape[0]
    top_c = idx._budget.top_c(k, n)
    SUB = 512
    chunk, n_eq, rem = scan.chunk_plan(n_pad, SUB)
    bins, groups, rows_kpad = scan.fused_bin_plan(n_pad, top_c)
    print(f"top_c={top_c} bins={bins} groups={groups} rows_kpad={rows_kpad}",
          flush=True)

    q16 = queries[:SUB].astype(np.float16)
    q_dev = jax.device_put(q16)
    tiny = jax.jit(lambda a: jnp.sum(a[:1, :1].astype(jnp.float32)))
    np.asarray(tiny(q_dev))

    out = {"n": n, "dim": dim, "bits": bits, "top_c": top_c, "bins": bins,
           "stages_ms": {}, "sweep": {}}
    floor = med(lambda: np.asarray(tiny(q_dev)))
    out["stages_ms"]["floor"] = floor

    p = arrays.raw.shape[1]

    def kernel_inputs():
        planes_k = arrays.planes
        aux_k = arrays.node_aux
        if rows_kpad != n_pad:
            padr = rows_kpad - n_pad
            planes_k = jnp.pad(planes_k, ((0, padr), (0, 0), (0, 0)))
            aux_k = jnp.pad(aux_k, ((0, 0), (0, padr)))
            aux_k = aux_k.at[0, n_pad:].set(scan.PAD_SCORE)
        return planes_k, aux_k

    @jax.jit
    def keys_only(planes, node_aux, qr):
        qpad = hadamard.pad_to(qr.astype(jnp.float32), p)
        qc, w_fs, y_aux = scan._query_side(qpad, signs, aff_a, aff_b, kappa)
        planes_k, aux_k = planes, node_aux
        codes_i8 = pack.unpack_codes_i8(planes_k, p)
        cat_key = scan.fused_scan_keys(
            codes_i8, aux_k, qc.q_u.astype(jnp.int8), w_fs, y_aux, bins)
        return jnp.sum(cat_key.astype(jnp.uint64))

    planes_k, aux_k = kernel_inputs()
    planes_k = jax.device_put(planes_k)
    aux_k = jax.device_put(aux_k)
    out["stages_ms"]["keys_only"] = med(
        lambda: np.asarray(keys_only(planes_k, aux_k, q_dev))) - floor

    lane = np.arange(bins, dtype=np.int32)
    bin_base = jnp.asarray(np.tile(lane, 2))
    bin_stride = jnp.asarray(np.full(2 * bins, bins, np.int32))

    @jax.jit
    def keys_decode(planes, node_aux, qr):
        qpad = hadamard.pad_to(qr.astype(jnp.float32), p)
        qc, w_fs, y_aux = scan._query_side(qpad, signs, aff_a, aff_b, kappa)
        codes_i8 = pack.unpack_codes_i8(planes, p)
        cat_key = scan.fused_scan_keys(
            codes_i8, node_aux, qc.q_u.astype(jnp.int8), w_fs, y_aux, bins)
        cand = scan._decode_keys(cat_key, bin_base, bin_stride, top_c)
        return jnp.sum(cand)

    out["stages_ms"]["keys_decode"] = med(
        lambda: np.asarray(keys_decode(planes_k, aux_k, q_dev))) - floor

    def full():
        ids_d, d_d = scan.scan_search(
            arrays, q_dev, signs, aff_a, aff_b, n_dev, kappa=kappa,
            k=k, top_c=top_c, chunk=chunk, n_eq=n_eq, rem=rem, fused=True)
        packed = jnp.stack(
            [ids_d, jax.lax.bitcast_convert_type(d_d, jnp.int32)], 0)
        return np.asarray(packed)
    out["stages_ms"]["full_scan_search"] = med(full) - floor

    for s, v in out["stages_ms"].items():
        print(f"  {s:20s} {v:8.2f} ms", flush=True)

    # ---- sub-batch size sweep (production structure, per-sub uploads)
    for sub in (128, 256, 512, 1024):
        scan_index_mod.SEARCH_SUB_BATCH = sub
        ms = med(lambda: idx.search_batch(queries, k=k))
        ids, _ = idx.search_batch(queries, k=k)
        r10 = recall_at_k(np.asarray(ids), gt.astype(np.int64), k)
        out["sweep"][str(sub)] = {"ms": round(ms, 2),
                                  "qps": round(nq / (ms / 1e3)),
                                  "recall10": round(r10, 4)}
        print(f"sub={sub:5d}  {ms:8.2f} ms  "
              f"{out['sweep'][str(sub)]['qps']} qps  r10={r10:.4f}",
              flush=True)
    scan_index_mod.SEARCH_SUB_BATCH = 512

    res = Path(__file__).parent.parent / "results"
    fn = res / "r5_stage512.json"
    fn.write_text(json.dumps(out, indent=1))
    print(f"wrote {fn}")


if __name__ == "__main__":
    main()
