"""Isolate the selection cost: pure min vs min+argmin vs packed-key min.

All probes return tiny results (sum-reduced) so the tunnel fetch is
negligible; the full-pipeline probes return (Q, top_c) ids (2.4 MB fetch
~ 68 ms at the tunnel's 36 MB/s — subtract).
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
    np.asarray(fn())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn())
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


GMASK = jnp.uint32(0xFF)          # low 8 bits carry the group index
SIGN = jnp.uint32(0x80000000)


def monotone_u32(score_f32):
    """Order-preserving f32 -> u32 map (IEEE trick)."""
    u = jax.lax.bitcast_convert_type(score_f32, jnp.uint32)
    return jnp.where(
        (u & SIGN) != 0, ~u, u | SIGN
    )


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

    chunk, n_eq, rem = scan.chunk_plan(n_pad, q)
    nb = 2048

    def chunks():
        b, ww = planes.shape[1:]
        planes_r = planes[: n_eq * chunk].reshape(n_eq, chunk, b, ww)
        aux_r = (node_aux[:, : n_eq * chunk]
                 .reshape(6, n_eq, chunk).transpose(1, 0, 2))
        bases = jnp.arange(n_eq, dtype=jnp.int32) * chunk
        return planes_r, aux_r, bases

    def scan_over(body_reduce):
        """lax.scan over equal chunks; body_reduce(score)->per-chunk out."""
        planes_r, aux_r, bases = chunks()

        def body(_, xs):
            pl_c, aux_c, base = xs
            score = scan._chunk_scores(pl_c, aux_c, q_u_i8, w_fs, y_aux, p)
            return None, body_reduce(score, base)

        _, outs = jax.lax.scan(body, None, (planes_r, aux_r, bases))
        return outs

    tiny = jax.jit(lambda v: v[:2, :2] + 1.0)
    print(f"RTT floor:                   {med(lambda: tiny(node_aux)):8.1f} ms")

    @jax.jit
    def p_sum(planes, node_aux, q_u_i8, w_fs, y_aux):
        outs = scan_over(lambda s, b: jnp.sum(s, axis=1))
        return outs.sum(0)

    print(f"score+sum:                   "
          f"{med(lambda: p_sum(planes, node_aux, q_u_i8, w_fs, y_aux)):8.1f} ms")

    @jax.jit
    def p_min(planes, node_aux, q_u_i8, w_fs, y_aux):
        def r(s, b):
            g = s.shape[1] // nb
            return jnp.min(s.reshape(q, g, nb), axis=1)
        outs = scan_over(r)
        return outs.sum(axis=(0, 2))

    print(f"score+grouped min:           "
          f"{med(lambda: p_min(planes, node_aux, q_u_i8, w_fs, y_aux)):8.1f} ms")

    @jax.jit
    def p_argmin(planes, node_aux, q_u_i8, w_fs, y_aux):
        def r(s, b):
            g = s.shape[1] // nb
            s3 = s.reshape(q, g, nb)
            return jnp.min(s3, axis=1) + jnp.argmin(s3, axis=1).astype(
                jnp.float32
            )
        outs = scan_over(r)
        return outs.sum(axis=(0, 2))

    print(f"score+grouped min+argmin:    "
          f"{med(lambda: p_argmin(planes, node_aux, q_u_i8, w_fs, y_aux)):8.1f} ms")

    @jax.jit
    def p_packed(planes, node_aux, q_u_i8, w_fs, y_aux):
        def r(s, b):
            g = s.shape[1] // nb
            keys = monotone_u32(s).reshape(q, g, nb)
            gidx = jax.lax.broadcasted_iota(jnp.uint32, (q, g, nb), 1)
            keys = (keys & ~GMASK) | gidx
            return jnp.min(keys, axis=1)
        outs = scan_over(r)
        return outs.astype(jnp.int32).sum(axis=(0, 2))

    print(f"score+packed-key min:        "
          f"{med(lambda: p_packed(planes, node_aux, q_u_i8, w_fs, y_aux)):8.1f} ms")

    # full pipeline with packed keys -> top_c candidate ids
    @partial(jax.jit, static_argnames=("tc",))
    def full_packed(planes, node_aux, q_u_i8, w_fs, y_aux, tc):
        outs_key, outs_base, outs_stride = [], [], []

        def reduce_chunk(score, base, nb_c):
            g = score.shape[1] // nb_c
            keys = monotone_u32(score).reshape(q, g, nb_c)
            gidx = jax.lax.broadcasted_iota(jnp.uint32, (q, g, nb_c), 1)
            keys = (keys & ~GMASK) | gidx
            return jnp.min(keys, axis=1)

        planes_r, aux_r, bases = chunks()

        def body(_, xs):
            pl_c, aux_c, base = xs
            score = scan._chunk_scores(pl_c, aux_c, q_u_i8, w_fs, y_aux, p)
            return None, reduce_chunk(score, base, nb)

        _, keys_s = jax.lax.scan(body, None, (planes_r, aux_r, bases))
        outs_key.append(keys_s.transpose(1, 0, 2).reshape(q, -1))
        lane = np.arange(nb, dtype=np.int32)
        for c in range(n_eq):
            outs_base.append(c * chunk + lane)
            outs_stride.append(np.full(nb, nb, np.int32))
        if rem:
            pl_c = jax.lax.slice_in_dim(planes, n_eq * chunk, n_pad, axis=0)
            aux_c = jax.lax.slice_in_dim(node_aux, n_eq * chunk, n_pad,
                                         axis=1)
            score = scan._chunk_scores(pl_c, aux_c, q_u_i8, w_fs, y_aux, p)
            g = max(score.shape[1] // nb, 1)
            cut = g * nb
            outs_key.append(reduce_chunk(score[:, :cut], n_eq * chunk, nb))
            outs_base.append(n_eq * chunk + lane)
            outs_stride.append(np.full(nb, nb, np.int32))
            if cut < score.shape[1]:
                tail = score.shape[1] - cut
                keys_t = (monotone_u32(score[:, cut:]) & ~GMASK)
                outs_key.append(keys_t)
                outs_base.append(
                    n_eq * chunk + cut + np.arange(tail, dtype=np.int32)
                )
                outs_stride.append(np.zeros(tail, np.int32))

        cat_key = jnp.concatenate(outs_key, axis=1)
        bin_base = jnp.asarray(np.concatenate(outs_base))
        bin_stride = jnp.asarray(np.concatenate(outs_stride))
        # smallest tc keys: invert unsigned order -> signed int for top_k
        sel_key = jax.lax.bitcast_convert_type(
            ~cat_key ^ SIGN, jnp.int32
        )
        _, keep = jax.lax.top_k(sel_key, tc)
        kept = jnp.take_along_axis(cat_key, keep, axis=1)
        gi = (kept & GMASK).astype(jnp.int32)
        return gi * bin_stride[keep] + bin_base[keep]

    print(f"FULL packed pipeline -> ids: "
          f"{med(lambda: full_packed(planes, node_aux, q_u_i8, w_fs, y_aux, top_c)):8.1f} ms"
          f"  (minus ~68 ms fetch)")


if __name__ == "__main__":
    main()
