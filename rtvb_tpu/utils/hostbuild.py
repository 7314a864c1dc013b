"""Run one-time table builds on the host CPU backend.

Init-time builders (sky env map, light table, world tables) are small eager
jnp programs.  On the attached accelerator each tiny op is dispatched and
compiled individually — on this 1-core host that costs 10-40 s per builder
(the round-2 driver bench timed out on exactly this).  The CPU backend
compiles the same ops in milliseconds, so: build on CPU, transfer the
finished pytree to the default device in one hop.

The reference has no analog (its tables are built by CUDA kernels,
VoxelEngine.cu:386-716); this is the TPU-native equivalent of "build off
the critical path".
"""
from __future__ import annotations

import jax


def host_build(fn, *args, **kwargs):
    """Call fn(*args, **kwargs) with the CPU as the default jnp device, then
    move the resulting pytree to the default backend's device 0."""
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        out = fn(*args, **kwargs)
    target = jax.devices()[0]
    if target == cpu:           # tests force the CPU platform: no transfer
        return out
    return jax.device_put(out, target)
