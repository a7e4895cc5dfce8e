"""Serialization + host-side I/O (reference clstm_proto.cc, extras.cc)."""

from clstm_tpu.io.proto import save_net, load_net, proto_of_net, net_of_proto

__all__ = ["save_net", "load_net", "proto_of_net", "net_of_proto"]
