"""TPU-native compute ops: sampling math, attention kernels, mask builders."""

from mmada_parallel_tpu.ops import sampling  # noqa: F401
