from tpuslam.runtime.config import SlamConfig  # noqa: F401
