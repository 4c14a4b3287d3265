"""Round-5: diagnose the 10M/96d 1-bit budget blowup (VERDICT r4 item 3).

Builds the 10M 1-bit scan index (device-synthesized store), prints the
derived candidate budget, then isolates per-stage device costs at the
k=10 and k=100 budgets: fused scan+select kernel, key decode (top_k),
exact rerank.  Ends with an e2e QPS row at both k.
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
from cphnsw_tpu.search import scan
from cphnsw_tpu.utils.datasets import make_synthetic
from cphnsw_tpu.utils.eval import recall_at_k


def med(fn, reps=3):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def main():
    n, dim, bits = 10_000_000, 96, 1
    ds = make_synthetic("synthetic-10m-96d")
    queries, gt = ds["queries"], ds["groundtruth"]
    t0 = time.perf_counter()
    idx = ScanIndex(dim, bits=bits)
    base_dev = ds["base_dev_factory"]()
    idx.build(base_dev)
    del base_dev
    idx.finalize()
    print(f"build {time.perf_counter() - t0:.1f}s stages={idx.build_stages}",
          flush=True)
    print(f"budget anchors={idx._budget.anchors.tolist()} "
          f"ranks={idx._budget.ranks.tolist()}", flush=True)

    arrays = idx._arrays
    aff_a, aff_b, n_dev = idx._dev_scalars
    signs = idx._signs
    kappa = float((1 << bits) - 1)
    n_pad = arrays.raw.shape[0]
    out = {"n": n, "dim": dim, "bits": bits,
           "budget_anchors": idx._budget.anchors.tolist(),
           "budget_ranks": idx._budget.ranks.tolist(), "stages": {}}

    tiny = jax.jit(lambda a: jnp.sum(a[:1, :1].astype(jnp.float32)))
    z = jax.device_put(np.zeros((2, 2), np.float16))
    np.asarray(tiny(z))
    floor = med(lambda: np.asarray(tiny(z)))
    print(f"floor {floor:.1f} ms", flush=True)

    SUB = 512
    q16 = queries[:SUB].astype(np.float16)
    if len(q16) < SUB:  # pad to the power-of-two bucket (q % bq == 0)
        q16 = np.concatenate(
            [q16, np.repeat(q16[-1:], SUB - len(q16), axis=0)]
        )
    q_dev = jax.device_put(q16)
    np.asarray(tiny(q_dev))
    p = arrays.raw.shape[1]

    # e2e first (also instantiates the lazy bf16 rerank copy)
    for k in (10, 100):
        ms = med(lambda: idx.search_batch(queries, k=k))
        ids, _ = idx.search_batch(queries, k=k)
        r10 = recall_at_k(np.asarray(ids), gt.astype(np.int64), 10)
        out[f"e2e_k{k}"] = {
            "ms": round(ms, 1), "qps": round(len(queries) / (ms / 1e3)),
            "recall10": round(r10, 4),
        }
        print(f"e2e k={k}: {out[f'e2e_k{k}']}", flush=True)

    for k in (10, 100):
        top_c = idx._budget.top_c(k, n)
        bins, groups, rows_kpad = scan.fused_bin_plan(n_pad, top_c)
        chunk, n_eq, rem = scan.chunk_plan(n_pad, SUB)
        st = {"top_c": top_c, "bins": bins, "groups": groups}

        def full():
            ids_d, d_d = scan.scan_search(
                arrays, q_dev, signs, aff_a, aff_b, n_dev, kappa=kappa,
                k=k, top_c=top_c, chunk=chunk, n_eq=n_eq, rem=rem,
                fused=True, sketch=idx._sketch)
            packed = jnp.stack(
                [ids_d, jax.lax.bitcast_convert_type(d_d, jnp.int32)], 0)
            return np.asarray(packed)
        st["full_ms"] = round(med(full) - floor, 1)

        # isolated rerank at this top_c (arrays as jit ARGS — a closure
        # capture serializes 5 GB into the remote compile request)
        rng = np.random.default_rng(0)
        cand = jax.device_put(
            rng.integers(0, n, size=(SUB, top_c)).astype(np.int32))
        sketch = idx._sketch

        @jax.jit
        def rr(raw, norm_sq, sketch, qr, cand, n_dev):
            from cphnsw_tpu.ops import hadamard
            qpad = hadamard.pad_to(qr.astype(jnp.float32), p)
            qnorm = jnp.sum(qpad * qpad, -1)
            ids, d = scan._rerank(raw, norm_sq, qpad, qnorm,
                                  cand, n_dev, k, sketch=sketch)
            return jnp.sum(ids) + jnp.sum(jnp.where(d < 1e30, d, 0.0))

        st["rerank_ms"] = round(med(lambda: np.asarray(
            rr(arrays.raw, arrays.norm_sq, sketch, q_dev, cand, n_dev)))
            - floor, 1)

        # isolated decode at this width
        w = scan.FUSED_TOPM * bins
        keys_rand = jax.device_put(
            rng.integers(0, 2**32, size=(SUB, w), dtype=np.uint32))

        @jax.jit
        def dec(keys):
            return jnp.sum(scan._decode_keys(
                keys, None, None, top_c, uniform_bins=bins))

        st["decode_ms"] = round(med(lambda: np.asarray(dec(keys_rand)))
                                - floor, 1)
        st["kernel_ms"] = round(
            st["full_ms"] - st["decode_ms"] - st["rerank_ms"], 1)
        out["stages"][f"k{k}"] = st
        print(f"k={k}: {st}", flush=True)

    res = Path(__file__).parent.parent / "results"
    fn = res / "r5_10m_1bit_diag.json"
    fn.write_text(json.dumps(out, indent=1))
    print(f"wrote {fn}", flush=True)


if __name__ == "__main__":
    main()
