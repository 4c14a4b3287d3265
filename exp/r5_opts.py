"""Round-5: micro-bench select-width and rerank-dtype options at Q=512.

Uses /tmp/idx100k_1bit.npz (built by r5_stage512.py).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from cphnsw_tpu import ScanIndex
from cphnsw_tpu.ops import hadamard
from cphnsw_tpu.search import scan

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
    dim, bits, k = 128, 1, 10
    idx = ScanIndex(dim, bits=bits).load(IDX_FILE)
    arrays = idx._arrays
    n = idx.size
    top_c = idx._budget.top_c(k, n)
    Q = 512
    rng = np.random.default_rng(0)

    tiny = jax.jit(lambda a: jnp.sum(a[:1, :1].astype(jnp.float32)))
    z = jax.device_put(np.zeros((2, 2), np.float16))
    np.asarray(tiny(z))
    floor = med(lambda: np.asarray(tiny(z)))
    print(f"floor {floor:.2f} ms  top_c={top_c}", flush=True)

    # ---- decode width scan
    for w in (6144, 4096, 3072, 2048, 1536):
        keys = jax.device_put(
            rng.integers(0, 2**32, size=(Q, w), dtype=np.uint32))
        bin_base = jnp.asarray(
            rng.integers(0, n, w, dtype=np.int32))
        bin_stride = jnp.asarray(np.full(w, 1, np.int32))

        @jax.jit
        def dec(keys, bin_base=bin_base, bin_stride=bin_stride):
            return jnp.sum(
                scan._decode_keys(keys, bin_base, bin_stride, top_c))

        ms = med(lambda: np.asarray(dec(keys))) - floor
        print(f"decode W={w:5d}: {ms:7.2f} ms", flush=True)

    # ---- top_k directly on int32 at several k
    for w in (6144, 2048):
        x = jax.device_put(
            rng.integers(-2**31, 2**31, size=(Q, w)).astype(np.int32))

        @jax.jit
        def tk(x):
            v, i = jax.lax.top_k(x, top_c)
            return jnp.sum(i)

        ms = med(lambda: np.asarray(tk(x))) - floor
        print(f"raw top_k({top_c}) W={w:5d}: {ms:7.2f} ms", flush=True)

    # ---- rerank variants
    qpad_h = rng.standard_normal((Q, arrays.raw.shape[1])).astype(np.float32)
    qpad = jax.device_put(qpad_h)
    qnorm = jnp.sum(qpad * qpad, -1)
    cand = jax.device_put(
        rng.integers(0, n, size=(Q, top_c)).astype(np.int32))
    n_dev = jnp.asarray(n)

    @jax.jit
    def rr_f32(qpad, qnorm, cand):
        ids, d = scan._rerank(arrays.raw, arrays.norm_sq, qpad, qnorm,
                              cand, n_dev, k)
        return jnp.sum(ids) + jnp.sum(jnp.where(d < 1e30, d, 0.0))

    ms = med(lambda: np.asarray(rr_f32(qpad, qnorm, cand))) - floor
    print(f"rerank f32 C={top_c}: {ms:7.2f} ms", flush=True)

    # bf16 two-stage prototype
    raw16 = arrays.raw.astype(jnp.bfloat16)
    raw16 = jax.device_put(raw16)
    surv = max(4 * k, 32)

    @jax.jit
    def rr_bf16(qpad, qnorm, cand):
        q16 = qpad.astype(jnp.bfloat16)
        vecs = raw16[cand]                                # (Q, C, P) bf16
        ip = jnp.einsum("qcp,qp->qc", vecs, q16,
                        preferred_element_type=jnp.float32)
        d1 = qnorm[:, None] + scan.FLOAT_MAX * 0.0 + \
            arrays.norm_sq[cand] - 2.0 * ip
        d1 = jnp.where(cand < n_dev, d1, scan.FLOAT_MAX)
        _, keep = jax.lax.top_k(-d1, surv)
        ids2 = jnp.take_along_axis(cand, keep, axis=1)    # (Q, surv)
        vecs2 = arrays.raw[ids2]
        exact = (qnorm[:, None] + arrays.norm_sq[ids2]
                 - 2.0 * jnp.einsum("qcp,qp->qc", vecs2, qpad))
        exact = jnp.where(ids2 < n_dev, exact, scan.FLOAT_MAX)
        negd, sel = jax.lax.top_k(-exact, k)
        idsk = jnp.take_along_axis(ids2, sel, axis=1)
        idsk = jnp.where(negd > -scan.FLOAT_MAX, idsk, -1)
        return jnp.sum(idsk) + jnp.sum(jnp.where(-negd < 1e30, -negd, 0.0))

    ms = med(lambda: np.asarray(rr_bf16(qpad, qnorm, cand))) - floor
    print(f"rerank bf16->f32 C={top_c} surv={surv}: {ms:7.2f} ms",
          flush=True)

    # pure gather cost (f32 vs bf16)
    @jax.jit
    def gather32(cand):
        return jnp.sum(arrays.raw[cand].astype(jnp.float32))

    @jax.jit
    def gather16(cand):
        return jnp.sum(raw16[cand].astype(jnp.float32))

    print(f"gather f32: {med(lambda: np.asarray(gather32(cand))) - floor:7.2f} ms",
          flush=True)
    print(f"gather bf16: {med(lambda: np.asarray(gather16(cand))) - floor:7.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
