r"""Distributed execution over TPU meshes.

The reference is single-process/single-device (no DP/TP/PP/SP — verified: zero
occurrences of ``distributed``/``process_group`` under ``zuko/``); this layer
is the new TPU-native design mandated by the north star: a device mesh with
``data`` and ``model`` axes, NamedSharding annotations, and XLA-inserted
collectives (psum of grads/ELBO over ICI) at exactly the reduction points of
the MLE and reverse-KL losses.
"""

from .mesh import (  # noqa: F401
    distributed_init,
    make_mesh,
    replicate,
    shard_batch,
    shard_module,
    sharded_fused_log_prob,
    sharded_fused_sample,
    tensor_parallel_spec,
)
from .train import (  # noqa: F401
    TrainState,
    make_mle_step,
    make_reverse_kl_step,
    train_mle,
)

__all__ = [
    "TrainState",
    "distributed_init",
    "make_mesh",
    "make_mle_step",
    "make_reverse_kl_step",
    "replicate",
    "shard_batch",
    "shard_module",
    "sharded_fused_log_prob",
    "sharded_fused_sample",
    "tensor_parallel_spec",
    "train_mle",
]
