"""Host-backed design-time builds.

Design-time code (filter design, tap folding, state-pytree init) is tiny
NumPy math sprinkled with jnp constant creation (`jnp.float32`,
`jnp.zeros`, dtype-converting `jnp.asarray`). Those are EAGER ops: on a
remote accelerator backend every one is a separate per-op remote compile
(~40 s each through the axon relay, and some relay states reject eager
requests outright with UNIMPLEMENTED) — for work that has no business
running on the accelerator at all.

`host_build(fn, *args)` runs the builder with the host CPU backend as
the default device when one is registered, so all of its eager ops
execute locally. The resulting arrays are uncommitted: the first jitted
chain step moves them to the accelerator as pure transfers (which remote
relays serve fine) and they stay resident there.

This is a design principle, not just a workaround: device arrays in this
framework are created by jit or by transfer, never by eager ops on the
accelerator. When no CPU backend is registered (e.g. the environment
pins JAX_PLATFORMS to the accelerator alone), the builder runs as-is;
registering the host backend alongside (JAX_PLATFORMS=axon,cpu or
jax.config.update("jax_platforms", "axon,cpu")) activates the host path.
"""

from __future__ import annotations

import functools


@functools.cache
def _host_device():
    import jax

    try:
        return jax.local_devices(backend="cpu")[0]
    except Exception:
        return None


def host_build(fn, *args, **kwargs):
    """Run a design-time builder with eager ops pinned to the host CPU
    backend when one is registered; pass through unchanged otherwise."""
    import jax

    cpu = _host_device()
    if cpu is None:
        return fn(*args, **kwargs)
    with jax.default_device(cpu):
        return fn(*args, **kwargs)
