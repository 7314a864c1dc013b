"""Multi-chip scaling: pixel-tile data parallelism over a device Mesh.

The reference is single-GPU (SURVEY §2.13); the only meaningful multi-device
axis for a real-time path tracer is *data parallelism over pixel tiles* —
there is no cross-pixel communication in path tracing except the denoiser's
fixed-radius stencils (halo exchange) and global reductions (auto-exposure),
both of which ride ICI collectives.

Design:
* mesh axis "dp": the image's row dimension is sharded; every device traces
  and shades its own horizontal band (world tables are replicated — 16 KB).
* auto-exposure reductions become `psum` inside shard_map.
* the denoiser's temporal/à-trous stencils need rows from neighboring bands:
  `halo_exchange_rows` moves boundary rows with `ppermute` (ICI
  neighbor-to-neighbor), the framebuffer analog of context parallelism.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..core.camera import Camera
from ..ops import mathutil as m


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()[:n_devices] if n_devices else jax.devices()
    return Mesh(devs, (axis,))


def halo_exchange_rows(x, halo: int, axis_name: str = "dp"):
    """Return x padded with `halo` rows received from the neighboring shards
    (edge-clamped at the global image border). x: (rows_local, W[, C])."""
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    top = x[:halo]        # rows to send upward neighbor's bottom halo
    bot = x[-halo:]
    # receive: my top halo comes from the previous shard's bottom rows
    perm_down = [(i, (i + 1) % n) for i in range(n)]   # send to next
    perm_up = [(i, (i - 1) % n) for i in range(n)]
    from_prev = jax.lax.ppermute(bot, axis_name, perm_down)
    from_next = jax.lax.ppermute(top, axis_name, perm_up)
    # clamp at global borders (first/last shard replicate their edge rows)
    from_prev = jnp.where(idx == 0, jnp.broadcast_to(x[:1], from_prev.shape), from_prev)
    from_next = jnp.where(idx == n - 1, jnp.broadcast_to(x[-1:], from_next.shape), from_next)
    return jnp.concatenate([from_prev, x, from_next], axis=0)


def global_mean(x, axis_name: str = "dp"):
    """Mean over the full (sharded) image — auto-exposure's reduction."""
    s = jax.lax.psum(jnp.sum(x), axis_name)
    n = jax.lax.psum(jnp.asarray(x.size, jnp.float32), axis_name)
    return s / n


def sharded_render(mesh: Mesh, render_rows_fn, height: int, width: int,
                   replicated_args):
    """Run `render_rows_fn(y0, rows, *args)` as a shard_map over image bands.

    render_rows_fn must accept (row_offset_scalar, n_rows, *replicated_args)
    and return per-band outputs with leading dim n_rows.
    """
    n = mesh.devices.size
    assert height % n == 0, f"height {height} not divisible by {n} devices"
    rows = height // n

    def shard_body(*args):
        idx = jax.lax.axis_index("dp")
        y0 = idx * rows
        return render_rows_fn(y0, rows, *args)

    f = jax.shard_map(
        shard_body, mesh=mesh,
        in_specs=tuple(P() for _ in replicated_args),
        out_specs=P("dp"),
    )
    return f(*replicated_args)
