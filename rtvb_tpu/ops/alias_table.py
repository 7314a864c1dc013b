"""Alias tables: O(1) categorical sampling of light/sky distributions.

Capability parity with renderer/shaders/AliasTable.{h,cu} (GPU build via
atomic small/large pairing, device sample()/PMF()).  The build is exact
Vose/Walker on the host — light sets change only on block edits / sun moves,
which is off the hot path (the reference also rebuilds only on change,
VoxelEngine.cu:635-656).  Sampling is two small-table gathers + a compare,
usable in XLA or inside Pallas kernels via a gather functor.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp


class AliasTable(NamedTuple):
    prob: jnp.ndarray    # (N,) f32 acceptance probability of own column
    alias: jnp.ndarray   # (N,) i32 alias index
    pmf: jnp.ndarray     # (N,) f32 normalized probability mass


def build(weights) -> AliasTable:
    """Exact Vose alias-table construction (host-side, O(n))."""
    w = np.maximum(np.asarray(weights, np.float64), 0.0)
    n = len(w)
    total = w.sum()
    if total <= 0.0 or n == 0:
        n = max(n, 1)
        return AliasTable(
            prob=jnp.ones((n,), jnp.float32),
            alias=jnp.arange(n, dtype=jnp.int32),
            pmf=jnp.full((n,), 1.0 / n, jnp.float32),
        )
    pmf = w / total
    scaled = pmf * n
    prob = np.ones(n, np.float64)
    alias = np.arange(n, dtype=np.int32)

    small = [i for i in range(n) if scaled[i] < 1.0]
    large = [i for i in range(n) if scaled[i] >= 1.0]
    while small and large:
        s = small.pop()
        l = large.pop()
        prob[s] = scaled[s]
        alias[s] = l
        scaled[l] = scaled[l] - (1.0 - scaled[s])
        if scaled[l] < 1.0:
            small.append(l)
        else:
            large.append(l)
    for i in small + large:
        prob[i] = 1.0
        alias[i] = i

    return AliasTable(
        prob=jnp.asarray(prob, jnp.float32),
        alias=jnp.asarray(alias, jnp.int32),
        pmf=jnp.asarray(pmf, jnp.float32),
    )


def sample(table: AliasTable, u, gather=None):
    """Draw indices from the table: u uniform in [0,1) (any shape).
    Returns (index, pmf[index]). AliasTable.h:34-54 equivalent."""
    from .gatherlib import fast_gather, fast_gather_multi
    if gather is None:
        gather = fast_gather
    n = table.prob.shape[0]
    un = u * n
    col = jnp.clip(un.astype(jnp.int32), 0, n - 1)
    frac = un - col.astype(jnp.float32)
    p, a = fast_gather_multi((table.prob, table.alias), col)
    idx = jnp.where(frac < p, col, a)
    return idx, gather(table.pmf, idx)
