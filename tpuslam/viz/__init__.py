from tpuslam.viz.live import LiveViewer  # noqa: F401
from tpuslam.viz.plot import plot_state, save_state_png  # noqa: F401
