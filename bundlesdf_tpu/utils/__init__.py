from bundlesdf_tpu.utils.common import (
    BAD_COLOR,
    BAD_DEPTH,
    GLCAM_IN_CVCAM,
    depth2xyzmap,
    set_seed,
    to_homo,
    transform_pts,
)
from bundlesdf_tpu.utils.se3 import (
    geodesic_distance,
    kabsch,
    rot_geodesic_ignore_cam_z,
    se3_exp,
    se3_log,
    so3_exp,
    so3_log,
)
