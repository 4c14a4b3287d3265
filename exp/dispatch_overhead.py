"""Isolate the ~25 ms per-call overhead seen after ScanIndex finalize.

Times a trivial jitted op and slice-sized score matmuls before and after
the index arrays are resident, in one process.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def med(fn, reps=10):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


tiny = jax.jit(lambda a: a + 1)
x = jnp.ones((8, 8))
print(f"tiny op BEFORE build: {med(lambda: tiny(x).block_until_ready()):7.2f} ms")

from cphnsw_tpu import ScanIndex
from cphnsw_tpu.utils.datasets import make_synthetic

ds = make_synthetic("synthetic-100k-128d", n_queries=1024)
idx = ScanIndex(128, bits=1).build(ds["base"]).finalize()
arrays = idx._arrays

print(f"tiny op AFTER build:  {med(lambda: tiny(x).block_until_ready()):7.2f} ms")

q = jax.device_put(np.asarray(ds["queries"], np.float32))
q_i8 = jnp.zeros((1024, 128), jnp.int8)


@jax.jit
def mm(qq, codes):
    return jax.lax.dot_general(
        qq, codes, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


for rows in (1024, 16384, 100096):
    from cphnsw_tpu.ops import pack as _pack
    codes = _pack.unpack_codes_i8(arrays.planes[:rows], arrays.raw.shape[1])
    codes.block_until_ready()
    t = med(lambda: mm(q_i8, codes).block_until_ready())
    print(f"int8 matmul 1024x128x{rows:6d}: {t:7.2f} ms")

# is it the argument COUNT / total bytes of resident buffers?
big = jnp.ones((100096, 128), jnp.float32)
big.block_until_ready()
print(f"tiny op with 151MB resident: {med(lambda: tiny(x).block_until_ready()):7.2f} ms")

# pass the big buffer as an argument but use one element
@jax.jit
def touch(a, b):
    return a + b[0, 0]

print(f"op taking big arg (unused bulk): {med(lambda: touch(x, big).block_until_ready()):7.2f} ms")
