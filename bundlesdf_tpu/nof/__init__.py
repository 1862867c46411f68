"""Neural Object Field (NOF): truncated-SDF neural field trained per video.

TPU-native re-design of the reference NOF trainer (`nerf_runner.py`,
`nerf_helpers.py`): pure-JAX parameter pytrees, one jitted train step,
dense occupancy grid instead of the kaolin octree, Pallas/XLA hash grid.
"""
from bundlesdf_tpu.nof.models import (
    NofSpec,
    init_nof_params,
    nof_forward,
    pose_array_matrices,
    sh_encode,
)
from bundlesdf_tpu.nof.runner import NofRunner
