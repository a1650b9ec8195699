"""Checkpoint / resume (SURVEY.md section 5.4).

Two complementary formats:

1. **PLY** stays the canonical portable scene checkpoint (with the ``label``
   property), exactly as in the reference pipeline where the labeler's
   output PLY is the artifact the viewer consumes
   (deep_learning_segmentation.py:311-332) — see ``gsplat_tpu.io.ply``.
2. **Orbax** sharded array checkpoints for training state and resumable
   vote accumulators: a multi-host vote sweep over 311 views can stop and
   resume mid-pass, and TrainState (params + Adam moments + step) restores
   onto any mesh.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def save_pytree(path: str, tree: Any) -> None:
    """Save any pytree (TrainState, GaussianScene, vote accumulators)."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), tree, force=True)


def restore_pytree(path: str, like: Optional[Any] = None) -> Any:
    """Restore a pytree; pass ``like`` (matching structure, possibly sharded
    arrays) to restore with target structure/shardings."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        if like is None:
            return ckptr.restore(path)
        targets = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(
                jnp_shape(x), x.dtype,
                sharding=getattr(x, "sharding", None)), like)
        return ckptr.restore(path, targets)


def jnp_shape(x):
    return tuple(x.shape)


class VoteCheckpoint:
    """Resumable majority-vote sweep: persists the vote histogram and the
    index of the next view to process (the analogue of re-running the
    reference's 311-view loop from scratch after a failure)."""

    def __init__(self, directory: str):
        self.directory = os.path.abspath(directory)

    def _path(self) -> str:
        return os.path.join(self.directory, "votes")

    def save(self, votes, next_view: int) -> None:
        save_pytree(self._path(), {
            "votes": np.asarray(votes),
            "next_view": np.asarray(next_view, np.int64),
        })

    def load(self):
        if not os.path.exists(self._path()):
            return None, 0
        d = restore_pytree(self._path())
        return d["votes"], int(d["next_view"])
