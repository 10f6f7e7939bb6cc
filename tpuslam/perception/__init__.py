from tpuslam.perception.vlp16 import (  # noqa: F401
    VLP16_ELEVATIONS_DEG, decode_packet, decode_point_cloud_reading,
    spherical_to_xyz,
)
from tpuslam.perception.attention import AttentionConfig, detect_cones  # noqa: F401
