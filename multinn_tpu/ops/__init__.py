"""Hot-op dispatch layer (SURVEY §2.1): every sampling-critical op has a fused
Pallas TPU kernel and a pure-XLA fallback behind ONE interface. Models call
only this module; the implementation is selected by ``impl`` ("auto" picks the
Pallas kernel on TPU backends when shapes are supported, else XLA).
"""

from multinn_tpu.ops.gibbs import gibbs_chain, cd_loss  # noqa: F401
from multinn_tpu.ops.nade_ops import nade_sample, nade_log_prob  # noqa: F401
from multinn_tpu.ops.sampling import bernoulli  # noqa: F401
