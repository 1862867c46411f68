"""Pose-graph tracker: frame lifecycle, keyframe pool, RANSAC pose
estimation and multi-frame bundle adjustment.

TPU-native re-design of the reference's C++/CUDA tracking core
(`BundleTrack/src/Bundler.cpp`, `FeatureManager.cpp`,
`cuda/cuda_ransac.cu`, `cuda/Solver/*`): host-side Python orchestration with
all device math as a few batched jitted kernels.
"""
from bundlesdf_tpu.tracker.frame import Frame, FrameStatus
from bundlesdf_tpu.tracker.ransac import ransac_pose
from bundlesdf_tpu.tracker.ba import bundle_adjust, BAConfig
from bundlesdf_tpu.tracker.bundler import Bundler
