from tpuslam.parallel.mesh import make_slam_mesh, initialize_distributed  # noqa: F401
from tpuslam.parallel.distributed import (  # noqa: F401
    distributed_gn_step, distributed_optimize,
)
from tpuslam.parallel.multisession import multisession_optimize, stack_graphs  # noqa: F401
