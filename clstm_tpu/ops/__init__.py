"""Compute kernels: the TPU-native equivalent of clstm_compute.{h,cc}.

The reference implements per-timestep kernel pairs (forward_stack1/
backward_stack1, forward_full1/backward_full1, forward_statemem,
forward_nonlingate, forward_softmax; clstm_compute.cc ≈L1-450, unverified).
Here the same math is expressed as batched, whole-sequence JAX functions:
gate matmuls are hoisted out of the time loop onto the MXU, the recurrence
runs in a single ``lax.scan``, and backward passes come from ``jax.grad``
(with an optional fused Pallas cell + custom VJP for the hot path).
"""

from clstm_tpu.ops.nonlin import NONLIN, nonlin_apply
from clstm_tpu.ops.lstm import lstm_init, lstm_apply
from clstm_tpu.ops.ctc import (
    forward_algorithm,
    ctc_align_targets,
    ctc_align_targets_batched,
    mktargets,
    trivial_decode,
)

__all__ = [
    "NONLIN",
    "nonlin_apply",
    "lstm_init",
    "lstm_apply",
    "forward_algorithm",
    "ctc_align_targets",
    "ctc_align_targets_batched",
    "mktargets",
    "trivial_decode",
]
