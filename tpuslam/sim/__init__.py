from tpuslam.sim.tracks import Track, skidpad, acceleration, trackdrive  # noqa: F401
from tpuslam.sim.simulator import SimConfig, Scenario, simulate  # noqa: F401
