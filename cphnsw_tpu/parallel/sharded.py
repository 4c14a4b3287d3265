"""Mesh-sharded search: database sharding + query data-parallelism.

The distributed component with no reference counterpart (SURVEY.md
section 2.3): the reference is a single-process OpenMP library; its only
parallelism is shared-memory threads.  On TPU the index scales out over an
ICI mesh instead:

  * mesh axes ("data", "model"): query batches shard over "data";
    the database — codes, graph, raw vectors — shards over "model"
    (each model-shard owns a contiguous slice of the dataset and builds
    its own independent CP-HNSW subgraph);
  * one search step = shard_map over the mesh: every device runs the full
    DABS beam search on its local subgraph for its local query block,
    offsets local ids to global, then all-gathers per-shard top-k along
    "model" and merges — the cross-chip top-k all-gather merge from
    BASELINE.json's north star;
  * collectives ride ICI via jax.lax.all_gather; no NCCL/MPI analog
    is needed.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cphnsw_tpu.graph.build import NeighborStore
from cphnsw_tpu.search import beam

FLOAT_MAX = jnp.float32(jnp.finfo(jnp.float32).max)


class ShardedStore(NamedTuple):
    """All per-shard arrays stacked on a leading shard axis (S, ...)."""

    raw: jax.Array            # (S, N_s, P)
    norm_sq: jax.Array        # (S, N_s)
    nbr_ids: jax.Array        # (S, N_s, R)
    nbr_planes: jax.Array     # (S, N_s, R, B, W)
    nbr_aux: jax.Array        # (S, N_s, R, 4)
    entry_candidates: jax.Array  # (S, M)
    orig_ids: jax.Array       # (S, N_s) int32: caller's original vector
    #                           index per local node (>= n for pad rows)


def make_mesh(n_data: int, n_model: int, devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    assert devices.size >= n_data * n_model, (
        f"need {n_data * n_model} devices, have {devices.size}"
    )
    grid = devices[: n_data * n_model].reshape(n_data, n_model)
    return Mesh(grid, ("data", "model"))


def shard_store(store: ShardedStore, mesh: Mesh) -> ShardedStore:
    """Place each stacked array with its leading axis sharded over
    "model" (replicated over "data")."""
    spec = NamedSharding(mesh, P("model"))
    return ShardedStore(*(jax.device_put(a, spec) for a in store))


@functools.partial(
    jax.jit,
    static_argnames=(
        "bits", "k", "beam_cap", "max_steps", "n_seeds", "mesh", "n_real"
    ),
)
def sharded_search(
    store: ShardedStore,
    queries: jax.Array,
    params: beam.SearchParams,
    signs: jax.Array,
    mesh: Mesh,
    bits: int,
    k: int,
    beam_cap: int = 128,
    max_steps: int = 512,
    n_seeds: int = 4,
    n_real: int | None = None,
):
    """Global top-k over all shards.

    queries: (Q, dim) with Q divisible by the "data" axis size.  Returns
    (ids (Q, k) int32 GLOBAL ids = shard * N_s + local, dists (Q, k)).

    Returned ids are the CALLER'S ORIGINAL vector indices (the per-shard
    orig_ids arrays are applied device-side before the merge).  n_real:
    number of genuine (un-padded) vectors; rows whose original id >= n_real
    are shard-padding duplicates and are masked out before the cross-shard
    merge so they can never displace a distinct neighbor.
    """

    def local_search(raw, norm_sq, ids, planes, aux, cands, orig, q):
        # shard_map hands us the local block with the sharded axis size 1
        raw, norm_sq = raw[0], norm_sq[0]
        neighbors = NeighborStore.pack(ids[0], planes[0], aux[0])
        local_ids, local_d = beam.search_batch(
            raw, norm_sq, neighbors, cands[0], signs, q, params,
            bits=bits, k=k, beam_cap=beam_cap, max_steps=max_steps,
            n_seeds=n_seeds,
        )
        global_ids = jnp.where(
            local_ids >= 0, orig[0][jnp.maximum(local_ids, 0)], -1
        )
        if n_real is not None:
            pad_row = global_ids >= n_real
            global_ids = jnp.where(pad_row, -1, global_ids)
            local_d = jnp.where(pad_row, FLOAT_MAX, local_d)
        # cross-chip top-k merge along the model axis
        all_ids = jax.lax.all_gather(global_ids, "model", axis=0)  # (S,Q,k)
        all_d = jax.lax.all_gather(local_d, "model", axis=0)
        qn = q.shape[0]
        all_ids = jnp.moveaxis(all_ids, 0, 1).reshape(qn, -1)
        all_d = jnp.moveaxis(all_d, 0, 1).reshape(qn, -1)
        neg_top, sel = jax.lax.top_k(-all_d, k)
        return jnp.take_along_axis(all_ids, sel, axis=1), -neg_top

    in_specs = (
        *(P("model") for _ in range(7)),
        P("data", None),
    )
    out_specs = (P("data", None), P("data", None))
    return shard_map(
        local_search, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_rep=False,
    )(*store, queries)


def build_sharded_store(
    vectors: np.ndarray,
    bits: int,
    r: int,
    n_shards: int,
    signs,
    seed: int = 42,
) -> tuple[ShardedStore, np.ndarray]:
    """Partition the dataset into contiguous shards and build one subgraph
    per shard (host loop; each build is itself a batched device program).

    Returns (stacked store, global_new_to_old (n,) mapping global
    shard-local ids back to the caller's vector order)."""
    from cphnsw_tpu.graph import build as gbuild
    from cphnsw_tpu.ops import hadamard

    n = len(vectors)
    per = -(-n // n_shards)
    # pad the dataset so every shard has the same size (duplicates of the
    # last vector; their original ids are >= n so sharded_search masks
    # them out before the cross-shard merge)
    pad = per * n_shards - n
    if pad:
        vectors = np.concatenate([vectors, vectors[-1:].repeat(pad, 0)], 0)

    parts = {k: [] for k in ShardedStore._fields}
    new_to_old = np.empty(per * n_shards, dtype=np.int64)
    p = signs.shape[-1]
    for s in range(n_shards):
        chunk = vectors[s * per : (s + 1) * per]
        raw = hadamard.pad_to(jnp.asarray(chunk, jnp.float32), p)
        norm_sq = jnp.sum(raw * raw, -1)
        centroid = raw.mean(0)
        node_nop = jnp.linalg.norm(raw - centroid, axis=-1)
        res = gbuild.build_graph(
            raw, norm_sq, node_nop, signs, bits=bits, r=r, seed=seed + s
        )
        n2o = np.empty(per, np.int64)
        n2o[res.old_to_new] = np.arange(per)
        new_to_old[s * per : (s + 1) * per] = n2o + s * per
        parts["orig_ids"].append((n2o + s * per).astype(np.int32))

        m = int(min(per, max(16, 4 * np.sqrt(per))))
        rng = np.random.default_rng(seed + 7 + s)
        cand = np.unique(
            np.concatenate([[res.entry_point],
                            rng.choice(per, size=m, replace=False)])
        )
        # fixed-size candidate list across shards (pad with entry)
        m_fixed = int(max(16, 4 * np.sqrt(per)))
        if len(cand) < m_fixed:
            cand = np.concatenate(
                [cand, np.full(m_fixed - len(cand), res.entry_point)]
            )
        cand = cand[:m_fixed]

        parts["raw"].append(np.asarray(res.raw))
        parts["norm_sq"].append(np.asarray(res.norm_sq))
        parts["nbr_ids"].append(np.asarray(res.neighbors.ids))
        parts["nbr_planes"].append(np.asarray(res.neighbors.planes))
        parts["nbr_aux"].append(np.asarray(res.neighbors.aux))
        parts["entry_candidates"].append(cand.astype(np.int32))

    store = ShardedStore(
        **{k: jnp.asarray(np.stack(v)) for k, v in parts.items()}
    )
    return store, new_to_old


def _pooled_params(store, signs, bits, r, padded, max_shards=3):
    """EVT-CRC calibration pooled over up to max_shards shard subgraphs:
    each shard is calibrated independently and the per-field median is
    taken (robust to one unlucky partition; i.i.d. partitions make the
    shards near-exchangeable so the median is a consistent estimate)."""
    from cphnsw_tpu.calibration import calibrate as calib_mod
    from cphnsw_tpu.graph.build import NeighborStore

    n_local = int(store.raw.shape[1])
    profile = calib_mod.IndexProfile.derive(n_local, padded, r, bits)
    per_shard = []
    for s in range(min(int(store.raw.shape[0]), max_shards)):
        nb = NeighborStore.pack(
            store.nbr_ids[s], store.nbr_planes[s], store.nbr_aux[s]
        )
        snap = calib_mod.calibrate(
            store.raw[s], store.norm_sq[s], nb, signs, bits, profile,
        )
        per_shard.append(calib_mod.to_search_params(snap))
    if len(per_shard) == 1:
        return per_shard[0]
    pooled = {
        f: jnp.median(jnp.stack([getattr(p, f) for p in per_shard]), axis=0)
        for f in per_shard[0]._fields
    }
    pooled["gamma_warmup"] = pooled["gamma_warmup"].astype(jnp.int32)
    return beam.SearchParams(**pooled)


class ShardedIndex:
    """User-facing facade over the sharded store: CPIndex semantics with
    the database partitioned over the mesh's "model" axis.

    Each shard builds an independent CP-HNSW subgraph; EVT-CRC calibration
    is pooled (median) over several shard subgraphs; a search runs
    per-chip DABS + the cross-chip all-gather top-k merge and returns ids
    in the caller's original vector order.
    """

    def __init__(self, dim: int, bits: int = 1, r: int = 32, seed: int = 42):
        from cphnsw_tpu.ops import hadamard

        self.dim = dim
        self.bits = bits
        self.r = r
        self.seed = seed
        self._padded = hadamard.next_pow2(dim)
        self._signs = hadamard.rotation_signs(seed, self._padded)
        self._store = None
        self._mesh = None
        self._params = None
        self._n = 0

    def build(self, vectors: np.ndarray, mesh: Mesh):
        self._n = len(vectors)
        n_model = mesh.shape["model"]
        store, _ = build_sharded_store(
            vectors, self.bits, self.r, n_model, self._signs, self.seed
        )
        self._params = _pooled_params(
            store, self._signs, self.bits, self.r, self._padded
        )
        self._store = shard_store(store, mesh)
        self._mesh = mesh
        return self

    def search_batch(self, queries: np.ndarray, k: int = 10):
        ids, dists = sharded_search(
            self._store, jnp.asarray(queries, jnp.float32), self._params,
            self._signs, self._mesh, bits=self.bits, k=k, n_real=self._n,
        )
        return np.asarray(ids).astype(np.int64), np.asarray(dists)

    # ---------------------------------------------------------- persist
    def save(self, path):
        """Serialize the sharded store + pooled calibration (one npz).
        Mirrors Index.save's role for the sharded facade; the mesh itself
        is runtime state and is re-supplied at load."""
        import json

        if self._store is None:
            raise RuntimeError("ShardedIndex must be built before saving.")
        header = {
            "magic": "CPHNSW-TPU-SHARDED",
            "version": 1,
            "dim": self.dim,
            "bits": self.bits,
            "r": self.r,
            "seed": self.seed,
            "n": self._n,
            "params": {
                f: np.asarray(getattr(self._params, f)).tolist()
                for f in self._params._fields
            },
        }
        arrays = {
            f: np.asarray(getattr(self._store, f))
            for f in ShardedStore._fields
        }
        np.savez_compressed(
            path,
            header=np.frombuffer(
                json.dumps(header).encode(), dtype=np.uint8
            ),
            **arrays,
        )

    def load(self, path, mesh: Mesh):
        import json

        with np.load(path) as z:
            header = json.loads(bytes(z["header"].tobytes()).decode())
            if header.get("magic") != "CPHNSW-TPU-SHARDED":
                raise ValueError("Not a sharded CPHNSW-TPU index file.")
            if (header["dim"], header["bits"], header["r"]) != (
                self.dim, self.bits, self.r
            ):
                raise ValueError("Index file dim/bits/R mismatch.")
            if header["seed"] != self.seed:
                raise ValueError("Index file rotation seed mismatch.")
            if int(z["raw"].shape[0]) != mesh.shape["model"]:
                raise ValueError(
                    f"Index file has {z['raw'].shape[0]} shards; mesh "
                    f"model axis is {mesh.shape['model']}."
                )
            store = ShardedStore(
                **{f: jnp.asarray(z[f]) for f in ShardedStore._fields}
            )
            pf = header["params"]
        self._n = header["n"]
        self._params = beam.SearchParams(
            **{
                f: (
                    jnp.int32(pf[f]) if f == "gamma_warmup"
                    else jnp.asarray(pf[f], jnp.float32)
                )
                for f in beam.SearchParams._fields
            }
        )
        self._store = shard_store(store, mesh)
        self._mesh = mesh
        return self
