"""Scene normalization: fused object cloud -> translation/scale into [-1,1].
Replaces the reference's open3d/sklearn pipeline (`tool.py:18-132`)."""
from bundlesdf_tpu.scene.bounds import (compute_scene_bounds,
                                        compute_translation_scales,
                                        find_biggest_cluster,
                                        voxel_downsample)
