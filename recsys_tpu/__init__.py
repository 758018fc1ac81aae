"""recsys_tpu — a TPU-native two-stage recommender framework.

A from-scratch JAX/XLA/Pallas/pjit re-design of the capability surface of
the reference TF/Keras/TFRS recommender (``src/`` + ``app/`` of
OnlyAhad13/Recommendation-System-MAANG-NVIDIA-):

* two-tower retrieval with in-batch sampled-softmax negatives,
* DCN (deep & cross) ranking with multi-task CTR + rating heads,
* row-shardable embedding tables over a named device mesh,
* on-device sharded top-k retrieval (replacing FAISS),
* a jit-compiled trainer with checkpoint/resume and metric sinks,
* an HTTP serving layer with the same endpoint contract.

Everything is built TPU-first: SPMD over ``jax.sharding.Mesh``, pure
functional models (init/apply over pytrees), static shapes, XLA
collectives over ICI, and Pallas kernels for the hot ops.
"""

from recsys_tpu.config import (
    DataConfig,
    EvalConfig,
    MeshConfig,
    ModelConfig,
    RecsysConfig,
    TrainConfig,
)

__version__ = "0.1.0"

__all__ = [
    "RecsysConfig",
    "ModelConfig",
    "DataConfig",
    "TrainConfig",
    "MeshConfig",
    "EvalConfig",
    "__version__",
]
