"""Elastic recovery runner (SURVEY.md section 5 'failure detection /
elastic recovery').

The reference's only recovery affordance is per-object reset()
(agc.hpp:97-99). Here every chain state is an explicit pytree of KBs, so
recovery is: snapshot the state every K blocks; on a failed step (device
loss, wedged transport, preemption), rebuild the runner and resume from
the last snapshot -- at most K blocks are reprocessed and the output
stream stays exact from the snapshot point.
"""

from __future__ import annotations

import os
from typing import Callable

import jax

from ..io.checkpoint import load_state, save_state


class ElasticRunner:
    """Wraps a chain factory into a crash-resumable block processor.

    factory() -> object with .state (pytree), .with_state(s) or settable
    .state, and __call__(block). Snapshots to ``path`` every
    ``snapshot_every`` blocks; ``resume()`` (or construction with an
    existing snapshot) restores the newest snapshot and reports the block
    index to resume from.
    """

    def __init__(self, factory: Callable, path: str, snapshot_every: int = 16):
        self._factory = factory
        self._path = path
        self._every = int(snapshot_every)
        self.chain = factory()
        self.block_index = 0
        if os.path.exists(self._path + ".npz"):
            self.resume()

    def _set_state(self, state):
        if hasattr(self.chain, "with_state"):
            self.chain.with_state(state)
        else:
            self.chain.state = state

    def _get_state(self):
        return self.chain.state

    def snapshot(self):
        save_state(self._path + ".tmp.npz", {
            "state": self._get_state(), "block_index": self.block_index})
        os.replace(self._path + ".tmp.npz", self._path + ".npz")

    def resume(self) -> int:
        """Restore the newest snapshot; returns the block index to resume
        from (blocks >= this index must be re-fed)."""
        like = {"state": self._get_state(), "block_index": 0}
        data = load_state(self._path + ".npz", like)
        self._set_state(data["state"])
        self.block_index = int(data["block_index"])
        return self.block_index

    def __call__(self, block):
        try:
            out = self.chain(block)
        except Exception:
            # failed step: rebuild the runtime and restore the newest
            # snapshot (or fresh state if none exists yet), then re-raise
            # the ORIGINAL error; the caller replays from self.block_index
            self.chain = self._factory()
            if os.path.exists(self._path + ".npz"):
                self.resume()
            else:
                self.block_index = 0
            raise
        self.block_index += 1
        if self.block_index % self._every == 0:
            self.snapshot()
        return out
