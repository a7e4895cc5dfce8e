"""Nonlinearities.

Reference: the ``Nonlinearity`` enum {LIN, SIG, TANH, RELU} in
clstm_compute.h (≈L1-150, unverified; mount empty — see SURVEY.md §0).
The reference templates its affine kernel (forward_full1) on this enum;
here each is a plain jnp function fused by XLA into the surrounding matmul.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Names match the reference enum spellings used in layer kinds
# (LinearLayer/SigmoidLayer/TanhLayer/ReluLayer).
NONLIN = ("LIN", "SIG", "TANH", "RELU")


def nonlin_apply(kind: str, x: jax.Array) -> jax.Array:
    """Apply a reference nonlinearity by name. Static dispatch (kind is a
    Python string, resolved at trace time — no lax.switch needed)."""
    if kind == "LIN":
        return x
    if kind == "SIG":
        return jax.nn.sigmoid(x)
    if kind == "TANH":
        return jnp.tanh(x)
    if kind == "RELU":
        return jax.nn.relu(x)
    raise ValueError(f"unknown nonlinearity: {kind!r}")
