from tpuslam.geometry import se2, spherical, wgs84  # noqa: F401
from tpuslam.geometry.se2 import (  # noqa: F401
    compose, inverse, between, transform_to_world, transform_to_body, wrap_angle,
)
from tpuslam.geometry.spherical import (  # noqa: F401
    spherical_to_cartesian, lidar_to_cog, cone_to_global, cones_to_global,
)
