"""Shared machinery for the reference-compatible op classes.

Each op mirrors one reference class (names, kwargs, defaults from
wrapper.cpp) as a thin Python object holding an explicit state pytree and
dispatching to jitted kernels: `__call__` = array in / array out, state
carried between calls exactly as the reference's opaque liquid handles
carry theirs (SURVEY.md L2->L3 mapping).

Capability upgrades over the reference (mandated by SURVEY.md section 5):
every op exposes ``state`` (a serializable pytree) and ``with_state`` for
checkpoint/resume, which the reference cannot do (liquid state is opaque).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def as_c64(x, name="input"):
    x = np.asarray(x)
    if x.dtype not in (np.complex64, np.complex128):
        raise TypeError(f"{name}: expected complex64 array, got dtype {x.dtype}")
    if x.ndim != 1:
        raise TypeError(f"{name}: expected 1-D array, got shape {x.shape}")
    return jnp.asarray(x, jnp.complex64)


def as_f32(x, name="input"):
    x = np.asarray(x)
    if not np.issubdtype(x.dtype, np.floating) and not np.issubdtype(x.dtype, np.integer):
        raise TypeError(f"{name}: expected float32 array, got dtype {x.dtype}")
    if x.ndim != 1:
        raise TypeError(f"{name}: expected 1-D array, got shape {x.shape}")
    return jnp.asarray(x, jnp.float32)


class StatefulOp:
    """Base: explicit-state op. Subclasses set self._state (pytree)."""

    @property
    def state(self):
        """The op's full DSP state as a host pytree (checkpointable)."""
        return jax.tree.map(np.asarray, self._state)

    def with_state(self, state):
        """Resume from a previously captured state pytree."""
        self._state = jax.tree.map(jnp.asarray, state)
        return self
