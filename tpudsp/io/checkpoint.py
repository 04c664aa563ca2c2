"""Checkpoint / resume for op and chain state (SURVEY.md section 5).

The reference cannot serialize a chain mid-stream (liquid state is opaque;
closest affordance is warm-starting the AGC gain, agc.hpp:49-51). Here
every op/chain state is an explicit pytree, so checkpointing is a plain
save/load of arrays -- state is KBs, making per-block snapshots and
elastic recovery cheap (re-init mesh, resume from the last snapshot).
"""

from __future__ import annotations

import json

import numpy as np
import jax


def _flatten(state):
    leaves, treedef = jax.tree.flatten(state)
    return [np.asarray(x) for x in leaves], treedef


def save_state(path: str, state) -> None:
    """Save any state pytree (op.state, chain state, dict of them) to .npz."""
    leaves, treedef = _flatten(state)
    np.savez(path, __treedef__=np.frombuffer(
        json.dumps(str(treedef)).encode(), dtype=np.uint8),
        **{f"leaf_{i}": leaf for i, leaf in enumerate(leaves)})


def load_state(path: str, like):
    """Load a state pytree saved by save_state; ``like`` provides the tree
    structure (e.g. the op's current state). The snapshot's own recorded
    treedef and per-leaf shapes are validated against ``like`` -- a stale
    or mismatched snapshot raises instead of silently mis-assigning
    compatible-shaped leaves. Returns the restored pytree."""
    data = np.load(path, allow_pickle=False)
    leaves = [data[f"leaf_{i}"] for i in range(len(data.files) - 1)]
    like_leaves, treedef = jax.tree.flatten(like)
    saved_treedef = json.loads(bytes(data["__treedef__"]).decode())
    if saved_treedef != str(treedef):
        raise ValueError(
            f"checkpoint {path!r} holds a different state structure:\n"
            f"  saved:    {saved_treedef}\n  expected: {treedef}")
    if len(leaves) != len(like_leaves):
        raise ValueError(f"checkpoint {path!r} has {len(leaves)} leaves, "
                         f"expected {len(like_leaves)}")
    for i, (got, want) in enumerate(zip(leaves, like_leaves)):
        if np.shape(got) != np.shape(np.asarray(want)):
            raise ValueError(
                f"checkpoint {path!r} leaf {i} has shape {np.shape(got)}, "
                f"expected {np.shape(np.asarray(want))}")
    return jax.tree.unflatten(treedef, leaves)
