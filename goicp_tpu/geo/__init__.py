from goicp_tpu.geo.rotation import (
    quat_cube_rotation,
    quat_cube_in_SO3,
    quat_cube_overlaps_SO3,
    quat_cube_max_angle,
    axis_angle_rotation,
    axis_angle_max_angle,
    axis_angle_in_ball,
    rotation_displacement,
)
from goicp_tpu.geo.procrustes import procrustes, horn_quaternion, quat_to_matrix
from goicp_tpu.geo.normals import estimate_normals

__all__ = [
    "quat_cube_rotation",
    "quat_cube_in_SO3",
    "quat_cube_overlaps_SO3",
    "quat_cube_max_angle",
    "axis_angle_rotation",
    "axis_angle_max_angle",
    "axis_angle_in_ball",
    "rotation_displacement",
    "procrustes",
    "horn_quaternion",
    "quat_to_matrix",
    "estimate_normals",
]
