"""bundlesdf_tpu — TPU-native neural object SLAM.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of NVlabs/BundleSDF
(CVPR 2023): near-real-time 6-DoF tracking of an unknown rigid object from
monocular RGBD video with concurrent neural 3D reconstruction (a truncated-SDF
"Neural Object Field").

Layer map (mirrors reference /root/reference SURVEY.md §1, re-designed TPU-first):
  - `bundlesdf_tpu.bundlesdf.BundleSdf`   — orchestrator (ref bundlesdf.py:266)
  - `bundlesdf_tpu.nof`                   — Neural Object Field trainer (ref nerf_runner.py)
  - `bundlesdf_tpu.tracker`               — pose-graph tracker (ref BundleTrack/src/Bundler.cpp)
  - `bundlesdf_tpu.matcher`               — feature matching (ref loftr_wrapper.py + LoFTR)
  - `bundlesdf_tpu.ops`                   — fused XLA/Pallas kernels (ref CUDA kernels)
  - `bundlesdf_tpu.mesh`, `.scene`, `.eval`, `.datasets` — aux subsystems
"""

__version__ = "0.1.0"

import jax as _jax

# Pose/geometry math must not silently round through bfloat16: float32
# matmuls use full precision everywhere (the TPU default is one-pass bf16,
# which costs ~8e-3 relative error — fatal for SE(3) chains and Kabsch).
# Speed-critical NOF matmuls opt into bf16 via explicit dtypes instead.
_jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: the online tracker compiles one program
# per shape bucket (pair count, corres ladder, keyframe count, dense-point
# budget) at 10-40 s each through the dev tunnel — cached, every later
# process (benchmarks, drivers, tests) reuses them. Opt out with
# BUNDLESDF_TPU_NO_COMPILE_CACHE=1 or point BUNDLESDF_TPU_COMPILE_CACHE
# somewhere else.
import os as _os

if not _os.environ.get("BUNDLESDF_TPU_NO_COMPILE_CACHE"):
    _cache_dir = _os.environ.get(
        "BUNDLESDF_TPU_COMPILE_CACHE",
        _os.path.join(_os.path.expanduser("~"), ".cache", "bundlesdf_tpu",
                      "jax_cache"))
    _os.makedirs(_cache_dir, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
