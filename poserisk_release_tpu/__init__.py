"""PoseRisk-TPU: a TPU-native (JAX / XLA / Pallas) ergonomic-risk framework.

Re-implements the full capability surface of the PoseRisk reference pipeline
(video -> detection/tracking -> SPIN human-mesh regression -> joint angles ->
REBA/RULA ergonomic scoring -> reports/visualisation) as an idiomatic JAX
framework: every numeric stage runs inside jit-compiled XLA graphs, the hot
kernels (SMPL linear-blend skinning, crop/resample, rotation conversions) are
fused on device, and clips shard across a `jax.sharding.Mesh` of TPU chips.

Reference behavioural contract: hygenie1228/PoseRisk_RELEASE (see SURVEY.md).
"""

__version__ = "0.1.0"

from poserisk_release_tpu.config import Config, default_config  # noqa: F401
