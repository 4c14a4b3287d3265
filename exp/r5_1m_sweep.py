"""Round-5: 1M/128d sub-batch sweep + roofline accounting (VERDICT r4
items 6 + 7).

Builds the 1M 1-bit scan index, sweeps SEARCH_SUB_BATCH at Q=8192,
profiles the per-stage device times at the best point, and emits a
roofline statement: measured device time vs HBM-bandwidth time for the
bytes actually streamed and vs MXU-peak time for the int8 ops issued.

v5e peaks used: HBM 819 GB/s, MXU int8 394 TOPS, bf16 197 TFLOPs.
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
from cphnsw_tpu.api import scan_index as sim
from cphnsw_tpu.search import scan
from cphnsw_tpu.utils.datasets import make_synthetic
from cphnsw_tpu.utils.eval import recall_at_k

HBM_BPS = 819e9
MXU_INT8_OPS = 394e12


def med(fn, reps=5):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def main():
    n, dim, bits, k, nq = 1_000_000, 128, 1, 10, 8192
    ds = make_synthetic(f"synthetic-1m-{dim}d", n_queries=nq)
    queries, gt = ds["queries"], ds["groundtruth"]
    t0 = time.perf_counter()
    idx = ScanIndex(dim, bits=bits)
    base_dev = ds["base_dev_factory"]()
    idx.build(base_dev)
    del base_dev
    idx.finalize()
    print(f"build {time.perf_counter() - t0:.1f}s stages={idx.build_stages}",
          flush=True)
    print(f"budget ranks={idx._budget.ranks.tolist()}", flush=True)

    out = {"n": n, "dim": dim, "bits": bits, "nq": nq,
           "budget_ranks": idx._budget.ranks.tolist(), "sweep": {},
           "roofline": {}}

    best = (None, 1e18)
    for sub in (1024, 2048, 4096, 8192):
        sim.SEARCH_SUB_BATCH = sub
        ms = med(lambda: idx.search_batch(queries, k=k), reps=3)
        ids, _ = idx.search_batch(queries, k=k)
        r10 = recall_at_k(np.asarray(ids), gt.astype(np.int64), k)
        out["sweep"][str(sub)] = {
            "ms": round(ms, 1), "qps": round(nq / (ms / 1e3)),
            "recall10": round(r10, 4),
        }
        print(f"sub={sub}: {out['sweep'][str(sub)]}", flush=True)
        if ms < best[1]:
            best = (sub, ms)
    sim.SEARCH_SUB_BATCH = best[0]
    out["best_sub"] = best[0]

    # ---- roofline at the best operating point --------------------------
    arrays = idx._arrays
    aff_a, aff_b, n_dev = idx._dev_scalars
    signs = idx._signs
    kappa = float((1 << bits) - 1)
    n_pad, p = arrays.raw.shape
    top_c = idx._budget.top_c(k, n)
    bins, groups, rows_kpad = scan.fused_bin_plan(n_pad, top_c)
    SUB = best[0]
    chunk, n_eq, rem = scan.chunk_plan(n_pad, SUB)

    tiny = jax.jit(lambda a: jnp.sum(a[:1, :1].astype(jnp.float32)))
    q16 = queries[:SUB].astype(np.float16)
    q_dev = jax.device_put(q16)
    np.asarray(tiny(q_dev))
    floor = med(lambda: np.asarray(tiny(q_dev)))

    def full():
        ids_d, d_d = scan.scan_search(
            arrays, q_dev, signs, aff_a, aff_b, n_dev, kappa=kappa,
            k=k, top_c=top_c, chunk=chunk, n_eq=n_eq, rem=rem, fused=True,
            sketch=getattr(idx, "_sketch", None))
        packed = jnp.stack(
            [ids_d, jax.lax.bitcast_convert_type(d_d, jnp.int32)], 0)
        return np.asarray(packed)

    dev_ms = med(full) - floor
    # bytes streamed by one SUB-query pass (dominant terms); the byte
    # model follows the mode the search actually runs in
    sketch_mode = (
        idx._sketch is not None and idx._sketch.scale is not None
        and top_c >= scan.SKETCH_SCAN_MIN_C
    )
    if sketch_mode:
        surv = scan._rerank_survivors(k, top_c)
        bins_s, groups_s, rows_s = scan.fused_bin_plan(n_pad, surv)
        codes_bytes = rows_s * p                      # int8 sketch codes
        aux_bytes = 6 * rows_s * 4
        keys_bytes = SUB * scan.FUSED_TOPM * bins_s * 4 * 2
        rerank_bytes = SUB * surv * p * 4             # f32 survivors only
        mode = f"sketch-scan (surv={surv}, bins={bins_s})"
    else:
        codes_bytes = rows_kpad * p                   # unpacked est codes
        aux_bytes = 6 * rows_kpad * 4
        keys_bytes = SUB * scan.FUSED_TOPM * bins * 4 * 2
        rerank_bytes = SUB * top_c * p * 4            # f32 gather
        mode = "estimate-select"
    total_bytes = codes_bytes + aux_bytes + keys_bytes + rerank_bytes
    int8_ops = 2 * SUB * rows_kpad * p                # MXU MACs x2
    t_bw_ms = total_bytes / HBM_BPS * 1e3
    t_mxu_ms = int8_ops / MXU_INT8_OPS * 1e3
    out["roofline"] = {
        "sub": SUB, "top_c": top_c, "bins": bins, "mode": mode,
        "measured_device_ms": round(dev_ms, 2),
        "bytes": {"codes": codes_bytes, "aux": aux_bytes,
                  "keys": keys_bytes, "rerank_gather": rerank_bytes,
                  "total": total_bytes},
        "int8_ops": int8_ops,
        "hbm_bound_ms": round(t_bw_ms, 2),
        "mxu_bound_ms": round(t_mxu_ms, 3),
        "hbm_fraction_of_peak": round(t_bw_ms / max(dev_ms, 1e-9), 3),
        "binding": "hbm" if t_bw_ms > t_mxu_ms else "mxu",
    }
    print(f"roofline: {out['roofline']}", flush=True)

    res = Path(__file__).parent.parent / "results"
    fn = res / "r5_1m_sweep_roofline.json"
    fn.write_text(json.dumps(out, indent=1))
    print(f"wrote {fn}", flush=True)


if __name__ == "__main__":
    main()
