"""Network graph layer: the TPU-native INetwork.

The reference (clstm.h ≈L100-300, clstm.cc ≈L1-1000, unverified) builds a
recursively-composed tree of stateful ``INetwork`` objects with virtual
forward()/backward(). Here the tree is split into a *static spec* (kinds,
attrs, topology — Python data, resolved at trace time) and a *params pytree*
(arrays only), so the whole forward pass is a single pure jittable function
and backward is ``jax.grad``. The layer registry keyed by reference kind
strings preserves ``make_layer(kind)`` / checkpoint compatibility.
"""

from clstm_tpu.models.spec import (
    NetSpec,
    LayerDef,
    REGISTRY,
    register_layer,
    make_layer,
    init_net,
    apply_net,
    network_info,
    walk_weights,
)
from clstm_tpu.models.prefab import make_net, make_net_init
from clstm_tpu.models.codec import Codec

__all__ = [
    "NetSpec",
    "LayerDef",
    "REGISTRY",
    "register_layer",
    "make_layer",
    "init_net",
    "apply_net",
    "network_info",
    "walk_weights",
    "make_net",
    "make_net_init",
    "Codec",
]
