"""Optimized full-DB MXU scan prototype.

Ranking score per (q, n), dropping the per-query constant d_qc^2:
  score = nop^2 - 2*nop*b - 2*a*g*(C - ip_cp) - 2*a*g*(B/k)*wpc
          - 2*a*(A/k) * (g * fs)
with g = nop / max(ip_qo, floor) (0 where degenerate).

Variants measured:
  A) int8 MXU matmul for fs + fused f32 epilogue (exact algebra)
  B) one augmented bf16 matmul (codes pre-scaled by g, +5 aux columns)
Selection: lax.top_k vs lax.approx_max_k.
"""

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

N, DIM, Q, K = 100_000, 128, 1024, 10
ds = make_synthetic(f"synthetic-{N // 1000}k-{DIM}d", n_queries=Q)
base, queries, gt = ds["base"], ds["queries"], ds["groundtruth"]

BITS = 1
store = bruteforce.build_store(base, BITS)
calib = bruteforce.calibrate_affine(store, BITS)
print("built", flush=True)

kk = float((1 << BITS) - 1)
floor = jnp.maximum(jnp.asarray(calib.ip_qo_floor, jnp.float32), 1e-10)
qo = jnp.maximum(store.ip_qo, floor)
good = qo > 1e-10
g = jnp.where(good, store.nop / qo, 0.0)

# Node-side constants (rank-5 part)
node_aux = jnp.stack(
    [
        store.nop * store.nop,   # x 1
        store.nop,               # x -2b
        g * store.wpc,           # x -2a*B/k
        g,                       # x -2a*C
        g * store.ip_cp,         # x +2a
    ],
    axis=0,
)  # (5, N)

codes_i8 = store.codes_u  # (N, P) int8
codes_scaled_bf16 = (g[:, None] * store.codes_u.astype(jnp.float32)).astype(
    jnp.bfloat16
)
aug_bf16 = jnp.concatenate(
    [codes_scaled_bf16, node_aux.T.astype(jnp.bfloat16)], axis=1
)  # (N, P+5)


def query_coeffs(qpad):
    qc = quantize.encode_queries(qpad, store.signs)
    a = jnp.asarray(calib.affine_a, jnp.float32)
    b = jnp.asarray(calib.affine_b, jnp.float32)
    w_fs = -2.0 * a * qc.coeff_a / kk          # (Q,)
    y_aux = jnp.stack(
        [
            jnp.ones_like(qc.coeff_a),
            jnp.full_like(qc.coeff_a, -2.0 * b),
            -2.0 * a * qc.coeff_b / kk,
            -2.0 * a * qc.coeff_c,
            jnp.full_like(qc.coeff_a, 2.0 * a),
        ],
        axis=1,
    )  # (Q, 5)
    return qc, w_fs, y_aux


def rerank(qpad, cand_ids, k):
    cand_vecs = store.raw[cand_ids]
    cand_norms = store.norm_sq[cand_ids]
    qnorm = jnp.sum(qpad * qpad, axis=-1)
    exact = estimate.exact_l2_sq(qpad, qnorm, cand_vecs, cand_norms)
    neg_d, idx = jax.lax.top_k(-exact, k)
    return jnp.take_along_axis(cand_ids, idx, axis=1), -neg_d


@functools.partial(jax.jit, static_argnames=("k", "top_c", "approx"))
def search_int8(queries_in, k, top_c, approx):
    p = store.signs.shape[-1]
    qpad = hadamard.pad_to(queries_in.astype(jnp.float32), p)
    qc, w_fs, y_aux = query_coeffs(qpad)
    fs = jax.lax.dot_general(
        qc.q_u.astype(jnp.int8),
        codes_i8,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (Q, N)
    const_part = y_aux @ node_aux  # (Q, N) via (Q,5)x(5,N)
    score = const_part + (w_fs[:, None] * g[None, :]) * fs.astype(jnp.float32)
    if approx:
        _, cand_ids = jax.lax.approx_max_k(-score, top_c, recall_target=0.98)
    else:
        _, cand_ids = jax.lax.top_k(-score, top_c)
    return rerank(qpad, cand_ids, k)


@functools.partial(jax.jit, static_argnames=("k", "top_c", "approx"))
def search_bf16(queries_in, k, top_c, approx):
    p = store.signs.shape[-1]
    qpad = hadamard.pad_to(queries_in.astype(jnp.float32), p)
    qc, w_fs, y_aux = query_coeffs(qpad)
    y = jnp.concatenate(
        [w_fs[:, None] * qc.q_u.astype(jnp.float32), y_aux], axis=1
    ).astype(jnp.bfloat16)  # (Q, P+5)
    score = jax.lax.dot_general(
        y,
        aug_bf16,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Q, N)
    if approx:
        _, cand_ids = jax.lax.approx_max_k(-score, top_c, recall_target=0.98)
    else:
        _, cand_ids = jax.lax.top_k(-score, top_c)
    return rerank(qpad, cand_ids, k)


qj = jnp.asarray(queries)
for name, fn in (("int8+epi", search_int8), ("bf16-aug", search_bf16)):
    for approx in (False, True):
        for top_c in (100, 200, 400):
            ids, d = fn(qj, K, top_c, approx)
            jax.block_until_ready(ids)
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                ids, d = fn(qj, K, top_c, approx)
                jax.block_until_ready(ids)
                ts.append(time.perf_counter() - t0)
            qps = Q / min(ts)
            rec = (np.asarray(ids)[:, :, None] == gt[:, None, :K]).any(-1).mean()
            print(
                f"{name} approx={approx} top_c={top_c}: "
                f"recall@10={rec:.4f} QPS={qps:.0f}",
                flush=True,
            )
