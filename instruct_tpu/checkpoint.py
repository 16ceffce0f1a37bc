"""Checkpoint / resume for long MCMC runs.

The reference has none — a crashed 1M-iteration run restarts from zero
(survey §5); its only related artifacts are `printseeds` (random.c:60-63,
never called) and warm-start S values from the `-i` file.  Here the full
(sampler state, streaming accumulators, step counter) pytree is saved on a
cadence via orbax, and resume is **bitwise**: step keys are counter-based
(`fold_in(chain_key, step_index)`), so replaying from a checkpoint produces
exactly the draws the uninterrupted run would have produced.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
    _HAVE_ORBAX = True
except Exception:                      # pragma: no cover
    _HAVE_ORBAX = False


def _ckpt_path(directory: str, step: int) -> str:
    return os.path.join(os.path.abspath(directory), f"step_{step:012d}")


def _flat_dict(payload: Any):
    leaves, treedef = jax.tree.flatten(payload)
    d = {f"leaf_{i}": x for i, x in enumerate(leaves)
         if not (hasattr(x, "size") and x.size == 0)}
    return d, leaves, treedef


def save_checkpoint(directory: str, step: int, payload: Any) -> None:
    """Persist the (states, accums, ...) pytree at `step`.

    The pytree is stored as a flat leaf dict; zero-size leaves (mode-unused
    state fields, which orbax refuses) are skipped and re-grafted from the
    caller's template at restore time.
    """
    path = _ckpt_path(directory, step)
    d, _, _ = _flat_dict(payload)
    if _HAVE_ORBAX:
        ckpt = ocp.StandardCheckpointer()
        ckpt.save(path, d, force=True)
        ckpt.wait_until_finished()
    else:                              # pragma: no cover
        os.makedirs(path, exist_ok=True)
        np.savez(os.path.join(path, "state.npz"),
                 **{k: np.asarray(v) for k, v in d.items()})


def latest_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    steps = []
    for name in os.listdir(directory):
        if name.startswith("step_"):
            try:
                steps.append(int(name[5:]))
            except ValueError:
                pass
    return max(steps) if steps else None


def restore_checkpoint(directory: str, step: int, template: Any) -> Any:
    """Restore the payload saved at `step`, shaped like `template`."""
    path = _ckpt_path(directory, step)
    _, leaves, treedef = _flat_dict(template)
    if _HAVE_ORBAX:
        ckpt = ocp.StandardCheckpointer()
        abstract = {f"leaf_{i}": jax.ShapeDtypeStruct(np.shape(x), x.dtype)
                    for i, x in enumerate(leaves)
                    if not (hasattr(x, "size") and x.size == 0)}
        d = ckpt.restore(path, abstract)
    else:                              # pragma: no cover
        d = dict(np.load(os.path.join(path, "state.npz")))
    new_leaves = [d.get(f"leaf_{i}", t) for i, t in enumerate(leaves)]
    return jax.tree.unflatten(treedef, new_leaves)
