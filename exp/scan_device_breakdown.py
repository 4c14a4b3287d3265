"""Device-side cost breakdown of one Q=1024 scan: matmul / select / rerank."""

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


def med(fn, reps=10):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def main():
    n, dim, nq = 100_000, 128, 1024
    ds = make_synthetic(f"synthetic-{n // 1000}k-{dim}d", n_queries=nq)
    idx = ScanIndex(dim, bits=1).build(ds["base"]).finalize()
    arrays = idx._arrays
    q_dev = jax.device_put(ds["queries"])
    q_dev.block_until_ready()
    aff_a, aff_b, n_sc = idx._dev_scalars
    top_c = idx._budget.top_c(10, n)

    from cphnsw_tpu.ops import hadamard

    p = arrays.raw.shape[1]

    @jax.jit
    def qside(q):
        qpad = hadamard.pad_to(q.astype(jnp.float32), p)
        qc, w_fs, y_aux = scan._query_side(qpad, idx._signs, aff_a, aff_b, 1.0)
        return qc.q_u.astype(jnp.int8), w_fs, y_aux

    q_u_i8, w_fs, y_aux = qside(q_dev)
    print(f"query-side encode:  {med(lambda: qside(q_dev)[0].block_until_ready()):7.1f} ms")

    @jax.jit
    def scores_only(q_u_i8, w_fs, y_aux):
        return scan._chunk_scores(arrays.planes, arrays.node_aux, q_u_i8, w_fs, y_aux, p)

    s = scores_only(q_u_i8, w_fs, y_aux)
    print(f"scores (matmul+aux):{med(lambda: scores_only(q_u_i8, w_fs, y_aux).block_until_ready()):7.1f} ms")

    @partial(jax.jit, static_argnames=("tc", "exact"))
    def score_select(q_u_i8, w_fs, y_aux, tc, exact=False):
        sc = scan._chunk_scores(arrays.planes, arrays.node_aux, q_u_i8, w_fs, y_aux, p)
        return scan._select(sc, tc, exact)[1]

    for tc in (32, 128, 384):
        print(f"scores+approx tc={tc}: {med(lambda: score_select(q_u_i8, w_fs, y_aux, tc).block_until_ready()):7.1f} ms")
    print(f"scores+EXACT tc=384:{med(lambda: score_select(q_u_i8, w_fs, y_aux, 384, True).block_until_ready()):7.1f} ms")

    cand = score_select(q_u_i8, w_fs, y_aux, 384)

    @jax.jit
    def rerank_only(cand, q):
        qpad = hadamard.pad_to(q.astype(jnp.float32), p)
        qnorm = jnp.sum(qpad * qpad, axis=-1)
        return scan._rerank(arrays.raw, arrays.norm_sq, qpad, qnorm,
                            cand.astype(jnp.int32), n_sc, 10)[0]

    print(f"rerank 384 cands:   {med(lambda: rerank_only(cand, q_dev).block_until_ready()):7.1f} ms")


if __name__ == "__main__":
    main()
