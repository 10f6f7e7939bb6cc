from tpuslam.frontend.state import SlamState, initial_state  # noqa: F401
from tpuslam.frontend.keyframe import perform_keyframe, KeyframeOutputs  # noqa: F401
