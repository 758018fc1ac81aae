"""Model layer: pure init/apply functions over parameter pytrees.

TPU-first re-design of the reference's Keras models
(``src/models.py``): no layer objects, no string lookups in the forward
path (ids are dense ints), bfloat16 compute on the MXU, everything
traceable under ``jit``/``pjit``.
"""

from recsys_tpu.models.towers import TwoTower
from recsys_tpu.models.dcn import DeepCrossNetwork
from recsys_tpu.models.multitask import MultiTaskModel

__all__ = ["TwoTower", "DeepCrossNetwork", "MultiTaskModel"]
