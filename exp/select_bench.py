"""Candidate-selection strategies at 1M scale: what does top-C cost?

Compares, on synthetic (same shapes as ScanIndex 1M/128d 1-bit, Q=1024):
  A. current scan_search pipeline (chunked scores + approx_max_k/chunk)
  B. fused block-argmin: scores -> strided (Q, G, NB) min+argmin reduce
     (fuses into the score epilogue; output (Q, NB) bins) -> final top_k
  C. approx_max_k with aggregate_to_topk=False (raw binned reduction)
All report ms/batch for the FULL score+select (no rerank).
"""

import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from cphnsw_tpu.ops import pack
from cphnsw_tpu.search import scan


def med(fn, reps=5):
    """Time fn including a host fetch of its (small) result: on the
    remote axon backend block_until_ready does NOT block (results are
    futures resolved on fetch), so fetching is the only reliable sync."""
    np.asarray(fn())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn())
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def main():
    n_pad, p, q, bits, top_c = 1_000_192, 128, 1024, 1, 608
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    w = pack.num_words(p)
    planes = jax.random.bits(k1, (n_pad, bits, w), jnp.uint32)
    node_aux = jax.random.normal(k2, (6, n_pad), jnp.float32)
    q_u_i8 = jax.random.randint(k3, (q, p), 0, 16, dtype=jnp.int8)
    w_fs = jax.random.normal(k4, (q,), jnp.float32)
    y_aux = jax.random.normal(k4, (q, 5), jnp.float32)
    for a in (planes, node_aux, q_u_i8):
        a.block_until_ready()

    chunk, n_eq, rem = scan.chunk_plan(n_pad, q)
    print(f"chunk plan: chunk={chunk} n_eq={n_eq} rem={rem}")

    tiny = jax.jit(lambda v: v[:2, :2] + 1.0)
    print(f"RTT floor (tiny op + fetch):     "
          f"{med(lambda: tiny(node_aux)):8.1f} ms")

    # ---- A: current pipeline (score + per-chunk approx + merge) --------
    @partial(jax.jit, static_argnames=("tc",))
    def current(planes, node_aux, q_u_i8, w_fs, y_aux, tc):
        parts_neg, parts_ids = [], []

        def one_chunk(start, size):
            pl_c = jax.lax.slice_in_dim(planes, start, start + size, axis=0)
            aux_c = jax.lax.slice_in_dim(node_aux, start, start + size, axis=1)
            score = scan._chunk_scores(pl_c, aux_c, q_u_i8, w_fs, y_aux, p)
            neg, idx = scan._select(score, tc, False)
            return neg, idx.astype(jnp.int32) + start

        b, ww = planes.shape[1:]
        planes_r = planes[: n_eq * chunk].reshape(n_eq, chunk, b, ww)
        aux_r = (node_aux[:, : n_eq * chunk]
                 .reshape(6, n_eq, chunk).transpose(1, 0, 2))
        bases = jnp.arange(n_eq, dtype=jnp.int32) * chunk

        def body(_, xs):
            pl_c, aux_c, base = xs
            score = scan._chunk_scores(pl_c, aux_c, q_u_i8, w_fs, y_aux, p)
            neg, idx = scan._select(score, tc, False)
            return None, (neg, idx.astype(jnp.int32) + base)

        _, (neg_s, ids_s) = jax.lax.scan(body, None, (planes_r, aux_r, bases))
        parts_neg.append(neg_s.transpose(1, 0, 2).reshape(q, -1))
        parts_ids.append(ids_s.transpose(1, 0, 2).reshape(q, -1))
        if rem:
            neg, ids = one_chunk(n_eq * chunk, rem)
            parts_neg.append(neg)
            parts_ids.append(ids)
        cat_neg = jnp.concatenate(parts_neg, axis=1)
        cat_ids = jnp.concatenate(parts_ids, axis=1)
        _, keep = jax.lax.top_k(cat_neg, tc)
        return jnp.take_along_axis(cat_ids, keep, axis=1)

    t = med(lambda: current(planes, node_aux, q_u_i8, w_fs, y_aux,
                            top_c))
    print(f"A current (approx/chunk):        {t:8.1f} ms")

    # ---- B: fused strided block-argmin ---------------------------------
    # scores (Q, C) -> reshape (Q, G, NB): bin b holds columns {g*NB+b},
    # min+argmin over G fuse into the score epilogue as one reduce.
    @partial(jax.jit, static_argnames=("nb", "tc"))
    def blockmin(planes, node_aux, q_u_i8, w_fs, y_aux, nb, tc):
        outs_min, outs_col = [], []
        b, ww = planes.shape[1:]
        planes_r = planes[: n_eq * chunk].reshape(n_eq, chunk, b, ww)
        aux_r = (node_aux[:, : n_eq * chunk]
                 .reshape(6, n_eq, chunk).transpose(1, 0, 2))
        bases = jnp.arange(n_eq, dtype=jnp.int32) * chunk

        def reduce_chunk(score, base):
            g = score.shape[1] // nb
            s3 = score.reshape(q, g, nb)
            mins = jnp.min(s3, axis=1)
            args = jnp.argmin(s3, axis=1).astype(jnp.int32)
            lane = jnp.arange(nb, dtype=jnp.int32)[None, :]
            cols = args * nb + lane + base
            return mins, cols

        def body(_, xs):
            pl_c, aux_c, base = xs
            score = scan._chunk_scores(pl_c, aux_c, q_u_i8, w_fs, y_aux, p)
            return None, reduce_chunk(score, base)

        _, (mins_s, cols_s) = jax.lax.scan(body, None, (planes_r, aux_r, bases))
        outs_min.append(mins_s.transpose(1, 0, 2).reshape(q, -1))
        outs_col.append(cols_s.transpose(1, 0, 2).reshape(q, -1))
        if rem:
            pl_c = jax.lax.slice_in_dim(planes, n_eq * chunk, n_pad, axis=0)
            aux_c = jax.lax.slice_in_dim(node_aux, n_eq * chunk, n_pad, axis=1)
            score = scan._chunk_scores(pl_c, aux_c, q_u_i8, w_fs, y_aux, p)
            g = max(score.shape[1] // nb, 1)
            cut = g * nb
            mins, cols = reduce_chunk(score[:, :cut], n_eq * chunk)
            outs_min.append(mins)
            outs_col.append(cols)
            if cut < score.shape[1]:
                outs_min.append(score[:, cut:])
                outs_col.append(
                    jnp.broadcast_to(
                        jnp.arange(cut, score.shape[1], dtype=jnp.int32)
                        + n_eq * chunk,
                        (q, score.shape[1] - cut),
                    )
                )
        cat_min = jnp.concatenate(outs_min, axis=1)
        cat_col = jnp.concatenate(outs_col, axis=1)
        _, keep = jax.lax.top_k(-cat_min, tc)
        return jnp.take_along_axis(cat_col, keep, axis=1)

    for nb in (2048, 4096, 8192):
        t = med(lambda: blockmin(planes, node_aux, q_u_i8, w_fs, y_aux,
                                 nb, top_c))
        total_bins = n_eq * nb + (rem // nb) * nb if rem else n_eq * nb
        print(f"B blockmin nb/chunk={nb:5d} (~{total_bins} bins): {t:8.1f} ms")

    # ---- C: approx_max_k aggregate_to_topk=False ------------------------
    @partial(jax.jit, static_argnames=("tc",))
    def approx_noagg(planes, node_aux, q_u_i8, w_fs, y_aux, tc):
        b, ww = planes.shape[1:]
        planes_r = planes[: n_eq * chunk].reshape(n_eq, chunk, b, ww)
        aux_r = (node_aux[:, : n_eq * chunk]
                 .reshape(6, n_eq, chunk).transpose(1, 0, 2))
        bases = jnp.arange(n_eq, dtype=jnp.int32) * chunk

        def body(_, xs):
            pl_c, aux_c, base = xs
            score = scan._chunk_scores(pl_c, aux_c, q_u_i8, w_fs, y_aux, p)
            neg, idx = jax.lax.approx_max_k(
                -score, tc, recall_target=0.9, aggregate_to_topk=False
            )
            return None, (neg, idx.astype(jnp.int32) + base)

        _, (neg_s, ids_s) = jax.lax.scan(body, None, (planes_r, aux_r, bases))
        cat_neg = neg_s.transpose(1, 0, 2).reshape(q, -1)
        cat_ids = ids_s.transpose(1, 0, 2).reshape(q, -1)
        _, keep = jax.lax.top_k(cat_neg, tc)
        return jnp.take_along_axis(cat_ids, keep, axis=1)

    t = med(lambda: approx_noagg(planes, node_aux, q_u_i8, w_fs, y_aux,
                                 top_c))
    print(f"C approx no-aggregate:           {t:8.1f} ms")

    # ---- floor: score only (no selection at all) -----------------------
    @jax.jit
    def score_only(planes, node_aux, q_u_i8, w_fs, y_aux):
        b, ww = planes.shape[1:]
        planes_r = planes[: n_eq * chunk].reshape(n_eq, chunk, b, ww)
        aux_r = (node_aux[:, : n_eq * chunk]
                 .reshape(6, n_eq, chunk).transpose(1, 0, 2))

        def body(acc, xs):
            pl_c, aux_c = xs
            score = scan._chunk_scores(pl_c, aux_c, q_u_i8, w_fs, y_aux, p)
            return acc + jnp.sum(score, axis=1), None

        acc, _ = jax.lax.scan(body, jnp.zeros((q,), jnp.float32),
                              (planes_r, aux_r))
        return acc

    t = med(lambda: score_only(planes, node_aux, q_u_i8, w_fs,
                               y_aux))
    print(f"floor score+sum only:            {t:8.1f} ms")


if __name__ == "__main__":
    main()
