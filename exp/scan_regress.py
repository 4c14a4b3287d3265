"""Diagnose ScanIndex vs the scan_tune experiment: estimator quality and
stage timing on identical data (make_synthetic 100k/128d, Q=8192)."""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from cphnsw_tpu import ScanIndex
from cphnsw_tpu.search import bruteforce, scan
from cphnsw_tpu.ops import hadamard, quantize
from cphnsw_tpu.utils.datasets import make_synthetic

N, DIM, K, Q = 100_000, 128, 10, 8192
BITS = 4
ds = make_synthetic(f"synthetic-{N // 1000}k-{DIM}d", n_queries=Q)
base, queries, gt = ds["base"], ds["queries"], ds["groundtruth"][:, :K]
qj = jnp.asarray(queries)


def est_recall(scores_fn, label):
    """Exact top-100 of the estimate ordering -> capture of true top-10."""
    caps = []
    for s in range(0, Q, 2048):
        sc = scores_fn(qj[s : s + 2048])
        _, ids = jax.lax.top_k(-sc, 100)
        ids = np.asarray(ids)
        caps.append((ids[:, :, None] == gt[s : s + 2048, None, :]).any(1))
    cap = np.concatenate(caps).mean()
    print(f"{label}: est-order capture@100 of true top-10 = {cap:.4f}",
          flush=True)


# --- tune-style store (closure-captured constants) ---------------------
store = bruteforce.build_store(base, BITS)
calib = bruteforce.calibrate_affine(store, BITS)
print(f"tune store: affine=({float(calib.affine_a):.4f},"
      f"{float(calib.affine_b):.4f}) floor={float(calib.ip_qo_floor):.2e}",
      flush=True)
kk = float((1 << BITS) - 1)
floor = jnp.maximum(jnp.asarray(calib.ip_qo_floor, jnp.float32), 1e-10)
qo = jnp.maximum(store.ip_qo, floor)
g = jnp.where(qo > 1e-10, store.nop / qo, 0.0)
node_aux5 = jnp.stack(
    [store.nop * store.nop, store.nop, g * store.wpc, g, g * store.ip_cp], 0
)
a0, b0 = float(calib.affine_a), float(calib.affine_b)


@jax.jit
def tune_scores(qin):
    p = store.signs.shape[-1]
    qpad = hadamard.pad_to(qin.astype(jnp.float32), p)
    qc = quantize.encode_queries(qpad, store.signs)
    w_fs = -2.0 * a0 * qc.coeff_a / kk
    y_aux = jnp.stack(
        [
            jnp.ones_like(qc.coeff_a),
            jnp.full_like(qc.coeff_a, -2.0 * b0),
            -2.0 * a0 * qc.coeff_b / kk,
            -2.0 * a0 * qc.coeff_c,
            jnp.full_like(qc.coeff_a, 2.0 * a0),
        ],
        1,
    )
    fs = jax.lax.dot_general(
        qc.q_u.astype(jnp.int8), store.codes_u,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return y_aux @ node_aux5 + (w_fs[:, None] * g[None, :]) * fs.astype(
        jnp.float32
    )


est_recall(tune_scores, "tune-style")

# --- ScanIndex ----------------------------------------------------------
idx = ScanIndex(DIM, bits=BITS).build(base).finalize(verbose=True)
arr = idx._arrays
aff_a = jnp.asarray(idx._affine_a, jnp.float32)
aff_b = jnp.asarray(idx._affine_b, jnp.float32)


@jax.jit
def scanidx_scores(qin):
    qpad = hadamard.pad_to(qin.astype(jnp.float32), arr.raw.shape[1])
    qc, w_fs, y_aux = scan._query_side(qpad, idx._signs, aff_a, aff_b, kk)
    return scan._chunk_scores(
        arr.planes, arr.node_aux, qc.q_u.astype(jnp.int8), w_fs, y_aux,
        arr.raw.shape[1],
    )[:, :N]


est_recall(scanidx_scores, "ScanIndex")

# cross-check the raw ingredients on a few nodes
enc_cmp = {}
for name, mine, theirs in [
    ("nop", idx._node_host["nop"][:N], np.asarray(store.nop)[:N]),
    ("ip_qo", idx._node_host["ip_qo"][:N], np.asarray(store.ip_qo)[:N]),
    ("ip_cp", idx._node_host["ip_cp"][:N], np.asarray(store.ip_cp)[:N]),
    ("wpc", idx._node_host["wpc"][:N], np.asarray(store.wpc)[:N]),
    ("codes", idx._node_host["codes"][:N].astype(np.int32),
     np.asarray(store.codes_u)[:N].astype(np.int32)),
]:
    diff = np.abs(np.asarray(mine, np.float64) - np.asarray(theirs, np.float64))
    print(f"{name}: max|diff|={diff.max():.3e} mean={diff.mean():.3e}",
          flush=True)

# --- stage timing on the full scan_search path -------------------------
def timeit(f, *args, label=""):
    out = f(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = f(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    print(f"{label}: {min(ts) * 1e3:.1f}ms", flush=True)
    return out


timeit(tune_scores, qj, label="tune scores-only (8192)")
timeit(scanidx_scores, qj, label="ScanIndex scores-only (8192)")


@functools.partial(jax.jit, static_argnames=("top_c",))
def tune_full(qin, top_c):
    sc = tune_scores(qin)
    _, cand = jax.lax.approx_max_k(-sc, top_c, recall_target=0.98)
    cand_vecs = store.raw[cand]
    qpad = hadamard.pad_to(qin.astype(jnp.float32), store.signs.shape[-1])
    qn = jnp.sum(qpad * qpad, -1)
    ex = (
        qn[:, None]
        + store.norm_sq[cand]
        - 2.0 * jnp.einsum("qp,qcp->qc", qpad, cand_vecs)
    )
    nd, ix = jax.lax.top_k(-ex, K)
    return jnp.take_along_axis(cand, ix, axis=1), -nd


ids_t = timeit(tune_full, qj, 100, label="tune full top_c=100")
rec = (np.asarray(ids_t[0])[:, :, None] == gt[:, None, :]).any(-1).mean()
print(f"tune full recall={rec:.4f}", flush=True)

chunk, n_eq, rem = scan.chunk_plan(arr.raw.shape[0], Q)
ids_s = timeit(
    scan.scan_search, arr, qj, idx._signs, aff_a, aff_b,
    jnp.asarray(N), kk, K, 128, chunk, n_eq, rem,
    label="scan_search top_c=128",
)
rec = (np.asarray(ids_s[0])[:, :, None] == gt[:, None, :]).any(-1).mean()
print(f"scan_search recall={rec:.4f}", flush=True)
