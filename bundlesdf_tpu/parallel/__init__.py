"""Multi-chip scaling via jax.sharding + shard_map.

The reference is a single-GPU multi-process system (SURVEY.md §2.3); the
TPU-native scaling axes are:
  - data parallelism over NOF ray batches within one video (`dp.py`)
  - data parallelism over videos for benchmark sweeps (`videos.py`)
Collectives are XLA psum/all_gather over ICI — no NCCL/MPI equivalent
exists or is needed.
"""
from bundlesdf_tpu.parallel.dp import (grads_on_batch_dp, make_ray_mesh,
                                       shard_batch, shard_rays,
                                       train_steps_dp)
