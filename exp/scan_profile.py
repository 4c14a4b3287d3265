"""Break the optimized scan into stages and time each on TPU."""

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
base, queries = ds["base"], ds["queries"]

BITS = 1
store = bruteforce.build_store(base, BITS)
calib = bruteforce.calibrate_affine(store, BITS)

kk = float((1 << BITS) - 1)
floor = jnp.maximum(jnp.asarray(calib.ip_qo_floor, jnp.float32), 1e-10)
qo = jnp.maximum(store.ip_qo, floor)
g = jnp.where(qo > 1e-10, store.nop / qo, 0.0)
node_aux = jnp.stack(
    [store.nop * store.nop, store.nop, g * store.wpc, g, g * store.ip_cp], 0
)
codes_i8 = store.codes_u


def query_coeffs(qpad):
    qc = quantize.encode_queries(qpad, store.signs)
    a = jnp.asarray(calib.affine_a, jnp.float32)
    b = jnp.asarray(calib.affine_b, jnp.float32)
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
    return qc, w_fs, y_aux


@jax.jit
def stage_encode(queries_in):
    qpad = hadamard.pad_to(queries_in.astype(jnp.float32), 128)
    qc, w_fs, y_aux = query_coeffs(qpad)
    return qpad, qc.q_u, w_fs, y_aux


@jax.jit
def stage_score(q_u, w_fs, y_aux):
    fs = jax.lax.dot_general(
        q_u.astype(jnp.int8), codes_i8,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return y_aux @ node_aux + (w_fs[:, None] * g[None, :]) * fs.astype(
        jnp.float32
    )


@functools.partial(jax.jit, static_argnames=("top_c",))
def stage_select(score, top_c):
    _, cand_ids = jax.lax.approx_max_k(-score, top_c, recall_target=0.98)
    return cand_ids


@functools.partial(jax.jit, static_argnames=("k",))
def stage_rerank(qpad, cand_ids, k):
    cand_vecs = store.raw[cand_ids]
    cand_norms = store.norm_sq[cand_ids]
    qnorm = jnp.sum(qpad * qpad, axis=-1)
    exact = estimate.exact_l2_sq(qpad, qnorm, cand_vecs, cand_norms)
    neg_d, idx = jax.lax.top_k(-exact, k)
    return jnp.take_along_axis(cand_ids, idx, axis=1), -neg_d


def tmin(f, *args, reps=5):
    out = f(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts), out


qj = jnp.asarray(queries)
t_enc, (qpad, q_u, w_fs, y_aux) = tmin(stage_encode, qj)
t_score, score = tmin(stage_score, q_u, w_fs, y_aux)
for top_c in (100, 400):
    t_sel, cand = tmin(lambda s: stage_select(s, top_c), score)
    t_rr, _ = tmin(lambda qp, c: stage_rerank(qp, c, K), qpad, cand)
    total = t_enc + t_score + t_sel + t_rr
    print(
        f"top_c={top_c}: encode={t_enc*1e3:.2f}ms score={t_score*1e3:.2f}ms "
        f"select={t_sel*1e3:.2f}ms rerank={t_rr*1e3:.2f}ms "
        f"sum={total*1e3:.2f}ms ({Q/total:.0f} QPS)",
        flush=True,
    )
