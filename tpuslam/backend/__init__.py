from tpuslam.backend.graph import FactorGraph, GraphCapacity  # noqa: F401
from tpuslam.backend.gauss_newton import GNConfig, optimize, gn_step  # noqa: F401
