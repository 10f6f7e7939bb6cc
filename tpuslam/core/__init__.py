from tpuslam.core.slam import Slam  # noqa: F401
