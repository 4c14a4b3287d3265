"""Device synchronization helper for backends where block_until_ready
is unreliable.

On the axon remote TPU backend `block_until_ready()` returns without
waiting (measured in round 4; see the verify recipe).  The only reliable
barrier is a real device->host fetch of a value that DEPENDS on the
work.  `force()` fetches a one-element slice of an already-dispatched
buffer: the slice is a separate tiny program whose input is the full
buffer, so the producer must finish materializing it before the fetch
can complete — the dead-code hazard only applies to slices fused into
the producer's own jit, which a post-dispatch slice never is.

Used as the HBM throttle in chunked build loops: unbounded async
dispatch lets the transient workspaces of many queued chunk programs
overlap and exhaust device memory; forcing each chunk bounds the live
set to one chunk's transients.
"""

import numpy as np


def force(x):
    """Block until the device buffer backing `x` is materialized."""
    arr = x[0] if isinstance(x, (tuple, list)) else x
    np.asarray(arr.ravel()[:1])
    return x
