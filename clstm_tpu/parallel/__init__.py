"""Parallelism: device meshes + data-parallel training.

The reference is strictly single-process/single-core (SURVEY.md §2
parallelism table: no DP/TP/PP/SP, no comm backend — the batch axis exists
in ``Batch`` but the CLIs train one line at a time). The TPU-native rebuild
makes data parallelism first-class: width-bucketed line batches are sharded
over a 1-D ICI mesh via ``shard_map``; gradients are combined with ``psum``
riding the ICI ring. TP/PP are deliberate non-goals at CLSTM's model sizes
(nhidden 100-200; SURVEY.md §2), and there is no attention, so sequence/
context parallelism does not apply — scale comes from batching lines.
"""

from clstm_tpu.parallel.mesh import make_mesh, shard_batch, replicate
from clstm_tpu.parallel.dp import make_parallel_train_step, pmean_tree

__all__ = ["make_mesh", "shard_batch", "replicate",
           "make_parallel_train_step", "pmean_tree"]
