"""Seed-robustness of the mid-block firing accuracy claim (r5).

The equivalence test (test_blocked_equivalence.py::
test_blocked_midblock_gn_decouples_cadence) asserts midblock ATE <=
per-frame ATE + 5e-3 on one scenario; this sweep checks the margin holds
across track/noise seeds. Measured (CPU, improved every=8, block=32 vs
the per-frame engine at the same cadence):

    track11/noise12: 0.0920 vs 0.0990  (midblock better)
    track23/noise7 : 0.0987 vs 0.1038  (midblock better)
    track42/noise99: 0.1044 vs 0.1027  (+1.7 mm, inside tolerance)

The occasional small regression is the documented <= block-1 frame
association lag; the usual WIN is the publish re-refine reading the
block-final (newer) map. Run: python scripts/exp_midblock_seeds.py
"""
import os
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from tpuslam.backend.graph import GraphCapacity
from tpuslam.frontend.blocked import run_pass_blocked
from tpuslam.frontend.pipeline import run_sequence
from tpuslam.frontend.state import initial_state
from tpuslam.runtime.config import SlamConfig
from tpuslam.sim import SimConfig, simulate, trackdrive
from tpuslam.sim.simulator import ate


def main():
    for tseed, nseed in ((11, 12), (23, 7), (42, 99)):
        track = trackdrive(seed=tseed)
        scen = simulate(track, SimConfig(laps=1.4, keyframe_dt=0.1,
                                         speed=8.0, max_range=20.0,
                                         seed=nseed))
        T = len(scen.times)
        cap = GraphCapacity(max_poses=max(64, 1 << (T - 1).bit_length()),
                            max_landmarks=256, max_obs=8192)
        obs = jnp.asarray(scen.obs, jnp.float32)
        valid = jnp.asarray(scen.obs_valid)
        poses = jnp.asarray(scen.odom_poses, jnp.float32)
        cfg = SlamConfig.improved(capacity=cap, periodic_gn_every=8)
        s_b, o_b = run_pass_blocked(obs, valid, poses, cfg, block=32)
        st, o_f = run_sequence(initial_state(cap), obs, valid, poses, cfg)
        a_b = ate(np.asarray(o_b.pose)[:, :2], scen.gt_poses[:, :2])
        a_f = ate(np.asarray(o_f.pose)[:, :2], scen.gt_poses[:, :2])
        print(f"track{tseed}/noise{nseed}: midblock e8b32 ATE={a_b:.4f} "
              f"per-frame e8 ATE={a_f:.4f} closed="
              f"{bool(s_b.loop_closure_complete)}"
              f"/{bool(st.loop_closure_complete)}")


if __name__ == "__main__":
    main()
