"""TPU validation + timing of the fused step kernel vs the XLA path."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from cphnsw_tpu.calibration import calibrate as calib_mod
from cphnsw_tpu.graph import build
from cphnsw_tpu.ops import hadamard
from cphnsw_tpu.search import beam

BITS = 1
N, DIM = 20_000, 128
Q = 256

rng = np.random.default_rng(5)
centers = rng.standard_normal((64, DIM)).astype(np.float32) * 4.0
x = centers[rng.integers(0, 64, N)] + rng.standard_normal((N, DIM)).astype(
    np.float32
)
p = hadamard.next_pow2(DIM)
signs = hadamard.rotation_signs(42, p)
raw = jnp.asarray(x)
norm_sq = jnp.sum(raw * raw, -1)
node_nop = jnp.linalg.norm(raw - raw.mean(0), axis=-1)
t0 = time.time()
res = build.build_graph(raw, norm_sq, node_nop, signs, bits=BITS, r=32,
                        verbose=True)
print(f"build: {time.time()-t0:.1f}s", flush=True)
profile = calib_mod.IndexProfile.derive(N, p, 32, BITS)
snap = calib_mod.calibrate(res.raw, res.norm_sq, res.neighbors, signs, BITS,
                           profile)
params = calib_mod.to_search_params(snap)

queries = x[rng.choice(N, Q, replace=False)] + 0.05 * rng.standard_normal(
    (Q, DIM)
).astype(np.float32)
cands = np.unique(np.concatenate(
    [[res.entry_point], rng.choice(N, 512, replace=False)]
)).astype(np.int32)

common = dict(bits=BITS, k=10, beam_cap=64, max_steps=64, expand_width=4,
              visited_hash_bits=0)

out = {}
for name, up in (("xla", False), ("pallas", True)):
    ids, d = beam.search_batch(
        res.raw, res.norm_sq, res.neighbors, jnp.asarray(cands), signs,
        jnp.asarray(queries), params, use_pallas=up, **common)
    jax.block_until_ready((ids, d))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        ids, d = beam.search_batch(
            res.raw, res.norm_sq, res.neighbors, jnp.asarray(cands), signs,
            jnp.asarray(queries), params, use_pallas=up, **common)
        jax.block_until_ready((ids, d))
        ts.append(time.perf_counter() - t0)
    out[name] = (np.asarray(ids), np.asarray(d), min(ts))
    print(f"{name}: {min(ts)*1e3:.1f} ms for Q={Q} "
          f"({Q/min(ts):.0f} QPS)", flush=True)

ids_x, d_x, _ = out["xla"]
ids_p, d_p, _ = out["pallas"]
eq = (ids_x == ids_p).mean()
print(f"id agreement: {eq:.6f}")
np.testing.assert_allclose(d_x, d_p, rtol=1e-4, atol=1e-5)
print("distances match.")
# recall check
gt_d = ((queries[:, None, :] - x[None, :, :]) ** 2).sum(-1)
gt = np.argsort(gt_d, 1)[:, :10]
n2o = np.empty(N, np.int64)
n2o[res.old_to_new] = np.arange(N)
for name in ("xla", "pallas"):
    ids = out[name][0]
    mapped = np.where(ids >= 0, n2o[np.maximum(ids, 0)], -1)
    r = (mapped[:, :, None] == gt[:, None, :]).any(-1).mean()
    print(f"{name} recall@10: {r:.4f}")
