"""Geometry: rotation conversions, quaternions, BVH IO, face blendshapes.

TPU-native replacement for the reference's geometry stack (reference
datasets/rotation_converter.py, utils/quaternion.py, datasets/pymo/,
datasets/data_tools.py joint maps): jnp conversions run on-device under jit;
BVH text IO and forward kinematics are vectorized host-side numpy.
"""

from diffsheg_tpu.geometry.rotations import (  # noqa: F401
    axis_angle_to_euler,
    axis_angle_to_matrix,
    axis_angle_to_quaternion,
    euler_to_axis_angle,
    euler_to_matrix,
    matrix_to_axis_angle,
    matrix_to_euler,
    matrix_to_quaternion,
    quaternion_to_axis_angle,
    quaternion_to_matrix,
)
from diffsheg_tpu.geometry.joints import (  # noqa: F401
    BEAT_CHANNELS,
    BEAT_JOINT_ORDER,
    BEAT_TOTAL_CHANNELS,
    SPINE_NECK_141_IN_BEAT,
    SPINE_NECK_141_ORDER,
    SPINE_NECK_DIM,
    scatter_subset_into_full,
    subset_channel_indices,
)
from diffsheg_tpu.geometry.bvh import (  # noqa: F401
    BvhData,
    BvhJoint,
    forward_kinematics,
    parse_bvh,
    parse_bvh_file,
    rewrite_template,
    rewrite_template_file,
    write_bvh,
)
from diffsheg_tpu.geometry.face import (  # noqa: F401
    ARKIT_FACIAL_51,
    read_face_json,
    write_face_json,
)
