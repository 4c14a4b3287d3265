"""Tune the fused scan: bits x top_c x selection variant, Q=8192."""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from cphnsw_tpu.search import bruteforce
from cphnsw_tpu.ops import estimate, hadamard, quantize
from cphnsw_tpu.utils.datasets import make_synthetic

N, DIM, K, Q = 100_000, 128, 10, 8192
ds = make_synthetic(f"synthetic-{N // 1000}k-{DIM}d", n_queries=Q)
base, queries, gt = ds["base"], ds["queries"], ds["groundtruth"]
qj = jnp.asarray(queries)


def make_search(bits):
    store = bruteforce.build_store(base, bits)
    calib = bruteforce.calibrate_affine(store, bits)
    kk = float((1 << bits) - 1)
    floor = jnp.maximum(jnp.asarray(calib.ip_qo_floor, jnp.float32), 1e-10)
    qo = jnp.maximum(store.ip_qo, floor)
    g = jnp.where(qo > 1e-10, store.nop / qo, 0.0)
    node_aux = jnp.stack(
        [store.nop * store.nop, store.nop, g * store.wpc, g, g * store.ip_cp], 0
    )
    codes_i8 = store.codes_u
    a = float(calib.affine_a)
    b = float(calib.affine_b)

    @functools.partial(jax.jit, static_argnames=("k", "top_c", "agg"))
    def search(queries_in, k, top_c, agg):
        p = store.signs.shape[-1]
        qpad = hadamard.pad_to(queries_in.astype(jnp.float32), p)
        qc = quantize.encode_queries(qpad, store.signs)
        w_fs = -2.0 * a * qc.coeff_a / kk
        y_aux = jnp.stack(
            [
                jnp.ones_like(qc.coeff_a),
                jnp.full_like(qc.coeff_a, -2.0 * b),
                -2.0 * a * qc.coeff_b / kk,
                -2.0 * a * qc.coeff_c,
                jnp.full_like(qc.coeff_a, 2.0 * a),
            ],
            1,
        )
        fs = jax.lax.dot_general(
            qc.q_u.astype(jnp.int8), codes_i8,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        score = y_aux @ node_aux + (w_fs[:, None] * g[None, :]) * fs.astype(
            jnp.float32
        )
        _, cand_ids = jax.lax.approx_max_k(
            -score, top_c, recall_target=0.98, aggregate_to_topk=agg
        )
        cand_vecs = store.raw[cand_ids]
        cand_norms = store.norm_sq[cand_ids]
        qnorm = jnp.sum(qpad * qpad, axis=-1)
        exact = estimate.exact_l2_sq(qpad, qnorm, cand_vecs, cand_norms)
        neg_d, idx = jax.lax.top_k(-exact, k)
        return jnp.take_along_axis(cand_ids, idx, axis=1), -neg_d

    return search


for bits in (1, 2, 4):
    search = make_search(bits)
    print(f"--- bits={bits}", flush=True)
    for top_c in (100, 200, 300, 400):
        for agg in (True, False):
            try:
                ids, d = search(qj, K, top_c, agg)
                jax.block_until_ready(ids)
            except Exception as e:
                print(f"top_c={top_c} agg={agg}: FAIL {e}", flush=True)
                continue
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                ids, d = search(qj, K, top_c, agg)
                jax.block_until_ready(ids)
                ts.append(time.perf_counter() - t0)
            qps = Q / min(ts)
            rec = (np.asarray(ids)[:, :, None] == gt[:, None, :K]).any(-1).mean()
            print(
                f"bits={bits} top_c={top_c} agg={agg}: recall@10={rec:.4f} "
                f"QPS={qps:.0f} t={min(ts)*1e3:.1f}ms",
                flush=True,
            )
