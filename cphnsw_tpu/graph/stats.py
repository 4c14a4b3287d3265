"""Graph topology statistics: data-derived alpha / tau / alpha_max.

Re-implementation of derive_graph_stats
(/root/reference/include/cphnsw/graph/graph_refinement.hpp:266-383) — a
sqrt(n)-sample estimate of the neighbor-distance distribution.  Distances
come from the device (batched matmuls); the quantile/MAD scalar math runs on
host (numpy), matching the host/device split used throughout.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

import jax

from cphnsw_tpu.calibration.huber import MAD_NORM_FACTOR
from cphnsw_tpu.graph.pruning import candidate_pair_dists

_pair_dists_jit = jax.jit(candidate_pair_dists)


@dataclass
class GraphStats:
    avg_degree: float = 0.0
    alpha: float = 1.0
    tau: float = 0.0
    alpha_max: float = 4.0

    def to_dict(self):
        return {
            "avg_degree": self.avg_degree,
            "alpha": self.alpha,
            "tau": self.tau,
            "alpha_max": self.alpha_max,
        }

    @classmethod
    def from_dict(cls, d):
        return cls(**d)


def derive_graph_stats(
    raw, norm_sq, work_ids, work_dists, sample_size: int, seed: int = 43
) -> GraphStats:
    """alpha = median neighbor dist / Q1 inter-neighbor dist, clamped to
    [1, min(Q3/Q1, 5)]; tau = MAD-sigma of NN distances; alpha_max =
    max(clamp, 2*alpha).  Inter-neighbor pairs are limited to the first
    2*sqrt(R) neighbors per sampled node (reference :298-321)."""
    ids = np.asarray(work_ids)
    dists = np.asarray(work_dists)
    n, r = ids.shape
    stats = GraphStats()
    if n == 0:
        return stats

    valid = ids >= 0
    stats.avg_degree = float(valid.sum(1).mean())

    rng = np.random.default_rng(seed)
    sample = rng.permutation(n)[: min(sample_size, n)]

    neighbor_dists = dists[sample][valid[sample]]
    nn_mask = valid[sample][:, 0]
    nn_dists = dists[sample][:, 0][nn_mask]

    inter_limit = int(np.clip(2.0 * np.sqrt(r), 4, r))
    sub_ids = jnp.asarray(ids[sample][:, :inter_limit])
    pd = np.asarray(_pair_dists_jit(raw, norm_sq, sub_ids))
    iu = np.triu_indices(inter_limit, k=1)
    inter = pd[:, iu[0], iu[1]].ravel()
    inter = inter[np.isfinite(inter) & (inter < 1e30)]

    if neighbor_dists.size == 0 or inter.size == 0 or nn_dists.size == 0:
        stats.alpha, stats.tau, stats.alpha_max = 1.0, 0.0, 4.0
        return stats

    # distances in the working graph are squared L2 in our build; the
    # reference uses squared L2 too (l2_distance_simd returns squared).
    nd_median = float(np.median(neighbor_dists))
    nd_q1 = float(np.quantile(neighbor_dists, 0.25))
    nd_q3 = float(np.quantile(neighbor_dists, 0.75))
    q3_over_q1 = nd_q3 / nd_q1 if nd_q1 > 1e-12 else 2.0

    nd_mean = float(neighbor_dists.mean())
    nd_cv = (
        float(neighbor_dists.std() / nd_mean) if nd_mean > 1e-12 else 0.2
    )

    nn_median = float(np.median(nn_dists))
    nn_mad = float(np.median(np.abs(nn_dists - nn_median)))
    tau = MAD_NORM_FACTOR * nn_mad

    d_inter = float(np.quantile(inter, 0.25))
    if d_inter < 1e-12:
        alpha = 1.0 + nd_cv
    else:
        alpha = nd_median / d_inter

    alpha_max = min(q3_over_q1, 5.0)
    alpha = float(np.clip(alpha, 1.0, alpha_max))
    alpha_max = max(alpha_max, 2.0 * alpha)

    stats.alpha, stats.tau, stats.alpha_max = alpha, tau, float(alpha_max)
    return stats
