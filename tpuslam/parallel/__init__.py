from tpuslam.parallel.mesh import (  # noqa: F401
    make_chain_mesh, make_slam_mesh, initialize_distributed,
)
from tpuslam.parallel.distributed import (  # noqa: F401
    distributed_gn_step, distributed_optimize,
)
from tpuslam.parallel.multisession import multisession_optimize, stack_graphs  # noqa: F401
from tpuslam.parallel.chain import chain_optimize, partition_edges_by_pose_block  # noqa: F401
from tpuslam.parallel.fleet import run_fleet_blocked  # noqa: F401
from tpuslam.parallel.map_blocks import associate_sharded  # noqa: F401
from tpuslam.parallel.resident import (  # noqa: F401
    chain_optimize_resident, partition_chain_resident,
    resident_comm_bytes_per_iteration,
)
from tpuslam.parallel.fusion import (  # noqa: F401
    align_to_anchor, fuse_graphs, fuse_sessions,
)
