"""clstm_tpu — a TPU-native rebuild of tmbdev/clstm.

A complete reimplementation of the CLSTM OCR/sequence-transduction framework
(reference: tmbdev/clstm, Apache-2.0, C++/Eigen) designed from scratch for
TPU hardware: JAX/XLA for the compute path (fused-gate LSTM cells driven by
``lax.scan``, batched masked sequences, on-device CTC alignment), Pallas for
the hot recurrent kernel, ``jax.sharding``/``shard_map`` for data parallelism
over chip meshes, and a native C++ host-side I/O layer (PNG decode, line
normalization, threaded prefetch).

Reference provenance note: the reference mount (/root/reference) was empty
during both the survey and this build session; reference citations in
docstrings use the upstream tmbdev/clstm paths with approximate (``≈L``)
line numbers reconstructed in SURVEY.md and are unverified against a tree.

Layer map (mirrors SURVEY.md §1):
  - ops/        compute kernels (lstm, ctc, nonlinearities, normalizer)
                ~ reference clstm_compute.cc, ctc section of clstm.cc
  - models/     network specs, layer registry, combinators, prefabs, codec,
                high-level CLSTMOCR/CLSTMText ~ clstm.cc/clstm_prefab.cc/clstmhl.h
  - io/         .clstm protobuf checkpoint format, PNG I/O, datasets
                ~ clstm_proto.cc, extras.cc
  - parallel/   mesh construction + data-parallel training step (no analogue
                in the single-process reference; SURVEY.md §2 parallelism table)
  - utils/      env-var config, unicode, metrics ~ utils.h, pstring.h
  - cli/        clstmocrtrain / clstmocr / clstmfiltertrain / clstmfilter
"""

__version__ = "0.1.0"

from clstm_tpu.models.spec import NetSpec, init_net, apply_net, network_info
from clstm_tpu.models.prefab import make_net, make_net_init
from clstm_tpu.models.codec import Codec
from clstm_tpu.models.hl import CLSTMOCR, CLSTMText, CharPrediction
from clstm_tpu.ops.ctc import ctc_align_targets, mktargets, trivial_decode
from clstm_tpu.io.proto import load_net, save_net
from clstm_tpu.train import TrainState, make_train_step, sgd_update

__all__ = [
    "NetSpec",
    "init_net",
    "apply_net",
    "network_info",
    "make_net",
    "make_net_init",
    "Codec",
    "CLSTMOCR",
    "CLSTMText",
    "CharPrediction",
    "ctc_align_targets",
    "mktargets",
    "trivial_decode",
    "load_net",
    "save_net",
    "TrainState",
    "make_train_step",
    "sgd_update",
    "__version__",
]
