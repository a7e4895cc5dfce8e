"""Native training-state checkpoints (.npz).

The reference's only format (.clstm proto) stores the model but NO
optimizer state — momentum is lost across resume (SURVEY.md §5
checkpoint/resume). The rebuild keeps the proto format for model exchange
(io/proto.py) and adds this sidecar: full TrainState (params + velocity +
step) as a flat .npz keyed by pytree paths. Loading restores training
exactly where it stopped.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from clstm_tpu.train import TrainState


def _flatten(tree) -> dict:
    out = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        key = jax.tree_util.keystr(path)
        out[key] = np.asarray(leaf)
    return out


def save_state(fname: str, state: TrainState) -> None:
    flat = {}
    flat.update({f"params{k}": v for k, v in _flatten(state.params).items()})
    flat.update({f"velocity{k}": v for k, v in _flatten(state.velocity).items()})
    flat["step"] = np.asarray(state.step)
    np.savez(fname, **flat)


def load_state(fname: str, template: TrainState) -> TrainState:
    """Restore into the structure of ``template`` (shapes must match)."""
    with np.load(fname) as z:
        def fill(tree, prefix):
            leaves_with_path = jax.tree_util.tree_leaves_with_path(tree)
            flat = []
            for path, leaf in leaves_with_path:
                key = prefix + jax.tree_util.keystr(path)
                arr = z[key]
                if arr.shape != leaf.shape:
                    raise ValueError(
                        f"checkpoint shape mismatch at {key}: "
                        f"{arr.shape} vs {leaf.shape}")
                flat.append(jnp.asarray(arr))
            treedef = jax.tree_util.tree_structure(tree)
            return jax.tree_util.tree_unflatten(treedef, flat)

        return TrainState(
            params=fill(template.params, "params"),
            velocity=fill(template.velocity, "velocity"),
            step=jnp.asarray(z["step"]),
        )
