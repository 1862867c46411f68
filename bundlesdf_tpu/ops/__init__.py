from bundlesdf_tpu.ops.preprocess import (
    bilateral_filter_depth,
    compute_covisibility,
    compute_normals,
    depth_to_xyz,
    erode_depth,
    filter_depth_edges,
    preprocess_depth_frame,
)
