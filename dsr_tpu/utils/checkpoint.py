"""Checkpoint/resume (SURVEY.md §5): orbax-backed sharded checkpoints of
model parameters / beamformer state / trainer accumulators, plus the
decode-progress high-water mark that makes recovery = re-decode the lost
batch (the reference's restart-from-model-files story, made first-class).
"""

from __future__ import annotations

import json
import os
import pathlib
from typing import Any

import jax
import numpy as np


def save(path: str, tree: Any) -> None:
    """Save a pytree checkpoint (orbax if available, npz fallback)."""
    path = os.path.abspath(path)
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, tree, force=True)
        ckptr.wait_until_finished()
        return
    except Exception:
        pass
    leaves, treedef = jax.tree.flatten(tree)
    pathlib.Path(path).mkdir(parents=True, exist_ok=True)
    np.savez(os.path.join(path, "ckpt.npz"), *[np.asarray(l) for l in leaves])
    with open(os.path.join(path, "treedef.txt"), "w") as f:
        f.write(str(treedef))


def restore(path: str, template: Any) -> Any:
    """Restore a pytree checkpoint into the structure of `template`."""
    path = os.path.abspath(path)
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(path, template)
    except Exception:
        pass
    z = np.load(os.path.join(path, "ckpt.npz"))
    leaves = [z[k] for k in z.files]
    treedef = jax.tree.structure(template)
    return jax.tree.unflatten(treedef, leaves)


class DecodeProgress:
    """Utterance-index high-water mark for restartable batch decoding."""

    def __init__(self, path: str):
        self.path = path
        self.done: set[str] = set()
        if os.path.exists(path):
            with open(path) as f:
                self.done = set(json.load(f))

    def is_done(self, utt_id: str) -> bool:
        return utt_id in self.done

    def mark(self, utt_id: str) -> None:
        self.done.add(utt_id)
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(sorted(self.done), f)
        os.replace(tmp, self.path)
