"""HNSW upper layers: hierarchical entry-point selection.

Parity component for the reference's upper-layer machinery
(/root/reference/include/cphnsw/api/hnsw_index.hpp:484-716): exponential
level assignment (level = floor(-ln(U) * mL), mL = 1/ln(M_UPPER)), one
navigable graph per level, greedy descent from the top at query time.

TPU-native construction: instead of the reference's sequential per-node
insertion (greedy descent + ef-limited search + alpha-CNG per inserted
node, :566-613), each level's graph is built with the SAME batched
NNDescent + alpha-CNG machinery used for layer 0, over the level's node
subset.  Functionally both produce a navigable proximity graph per level;
ours is one batched program per level instead of n_upper sequential
searches.

Query-time greedy descent (:617-638) runs as a batched while_loop: one
iteration gathers every query's current neighbor list, exact-scores it with
a gathered matmul, and steps to the argmin until no query improves.

The default Index entry strategy remains the sampled-entry seed scan
(search/beam.py) — one dense matmul beats pointer-chasing descent on TPU —
but the hierarchy is available via Index(entry_strategy="hnsw") for parity
and for datasets where it wins.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from cphnsw_tpu.graph import nndescent, pruning


def upper_layer_degree(r: int, padded_dim: int) -> int:
    """M_UPPER = R/2 + min(isqrt(P)/4, R/4)
    (core/adaptive_defaults.hpp:64-70)."""
    return r // 2 + min(math.isqrt(padded_dim) // 4, r // 4)


MIN_LAYER_RANDOM = 1e-15  # constants.hpp:26


def assign_levels(n: int, m_upper: int, seed: int = 42) -> np.ndarray:
    """Exponentially decaying level assignment (hnsw_index.hpp:484-503)."""
    ml = 1.0 / math.log(max(m_upper, 2))
    rng = np.random.default_rng(seed)
    u = np.maximum(rng.uniform(size=n), MIN_LAYER_RANDOM)
    return np.floor(-np.log(u) * ml).astype(np.int32)


class UpperLayers(NamedTuple):
    """Per-level subset graphs, all padded to the same tuple structure."""

    node_ids: tuple          # per level: (n_l,) int32 global ids
    nbr_idx: tuple           # per level: (n_l, M) int32 local indices, -1
    local_of_global: tuple   # per level: (n,) int32 local index or -1
    entry_global: int        # global id of the single top-level entry


def build_upper_layers(
    raw: jax.Array,
    norm_sq: jax.Array,
    r: int,
    seed: int = 42,
) -> UpperLayers | None:
    """Build the hierarchy; returns None when no node reaches level 1."""
    n, p = raw.shape
    m_up = upper_layer_degree(r, p)
    levels = assign_levels(n, m_up, seed)
    max_level = int(levels.max()) if n else 0
    if max_level == 0:
        return None

    node_ids, nbr_idx, local_maps = [], [], []
    for lvl in range(1, max_level + 1):
        subset = np.where(levels >= lvl)[0].astype(np.int32)
        n_l = len(subset)
        if n_l < 2:
            break
        sub_raw = raw[jnp.asarray(subset)]
        sub_norm = norm_sq[jnp.asarray(subset)]
        deg = min(m_up, n_l - 1)
        if n_l <= deg + 1:
            # tiny level: fully connected
            ids = np.tile(np.arange(n_l, dtype=np.int32), (n_l, 1))
            mask = ids != np.arange(n_l, dtype=np.int32)[:, None]
            full = np.full((n_l, deg), -1, np.int32)
            for i in range(n_l):
                others = ids[i][mask[i]][:deg]
                full[i, : len(others)] = others
            sel = jnp.asarray(full)
        else:
            wg = nndescent.run_adaptive(
                sub_raw, sub_norm, deg, seed=seed + 100 + lvl
            )
            ci, cd = pruning.prepare_candidates(wg.ids, wg.dists)
            pd = pruning.candidate_pair_dists(sub_raw, sub_norm, ci)
            sel, _ = pruning.select_alpha_cng(
                ci, cd, pd, jnp.zeros_like(cd),
                jnp.float32(1.2), jnp.float32(0.0), jnp.float32(2.4), deg,
            )
        lm = np.full(n, -1, np.int32)
        lm[subset] = np.arange(n_l, dtype=np.int32)
        node_ids.append(jnp.asarray(subset))
        nbr_idx.append(sel)
        local_maps.append(jnp.asarray(lm))

    if not node_ids:
        return None
    # top entry: node of the highest built level (first in its subset)
    entry_global = int(np.asarray(node_ids[-1])[0])
    return UpperLayers(
        node_ids=tuple(node_ids),
        nbr_idx=tuple(nbr_idx),
        local_of_global=tuple(local_maps),
        entry_global=entry_global,
    )


@functools.partial(jax.jit, static_argnames=("max_iters",))
def greedy_descend(
    upper: UpperLayers,
    raw: jax.Array,
    norm_sq: jax.Array,
    qpad: jax.Array,
    qnorm: jax.Array,
    max_iters: int = 32,
):
    """Greedy descent through all levels; returns (Q,) global entry ids for
    layer 0 (hnsw_index.hpp:197-201 + :617-638), batched over queries."""
    q = qpad.shape[0]
    cur_global = jnp.full((q,), upper.entry_global, jnp.int32)

    for lvl in range(len(upper.node_ids) - 1, -1, -1):
        ids_l = upper.node_ids[lvl]
        nbrs_l = upper.nbr_idx[lvl]
        lm = upper.local_of_global[lvl]

        cur_local = lm[cur_global]          # guaranteed present (nested)
        cur_d = (
            qnorm
            + norm_sq[cur_global]
            - 2.0
            * jnp.einsum("qp,qp->q", qpad, raw[cur_global],
                         precision=jax.lax.Precision.HIGHEST)
        )

        def body(state):
            cur_local, cur_d, improved, it = state
            nb = nbrs_l[cur_local]                       # (Q, M) local
            nb_safe = jnp.maximum(nb, 0)
            nb_global = ids_l[nb_safe]
            d = (
                qnorm[:, None]
                + norm_sq[nb_global]
                - 2.0
                * jnp.einsum("qp,qmp->qm", qpad, raw[nb_global],
                             precision=jax.lax.Precision.HIGHEST)
            )
            d = jnp.where(nb < 0, jnp.inf, d)
            j = jnp.argmin(d, axis=1)
            best_d = jnp.take_along_axis(d, j[:, None], 1)[:, 0]
            better = best_d < cur_d
            cur_local = jnp.where(
                better, jnp.take_along_axis(nb_safe, j[:, None], 1)[:, 0],
                cur_local,
            )
            cur_d = jnp.where(better, best_d, cur_d)
            return cur_local, cur_d, better.any(), it + 1

        def cond(state):
            _, _, improved, it = state
            return improved & (it < max_iters)

        cur_local, cur_d, _, _ = jax.lax.while_loop(
            cond, body, (cur_local, cur_d, jnp.bool_(True), jnp.int32(0))
        )
        cur_global = ids_l[cur_local]

    return cur_global
