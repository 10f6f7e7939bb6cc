from tpuslam.native import codec  # noqa: F401
