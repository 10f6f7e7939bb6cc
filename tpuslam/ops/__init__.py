from tpuslam.ops.association import associate, cost_matrix  # noqa: F401
