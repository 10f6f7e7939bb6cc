from tpuslam.io import messages  # noqa: F401
