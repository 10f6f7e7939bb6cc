#!/usr/bin/env python
"""Multi-host smoke test: distributed multi-session GN across real processes.

SURVEY.md §5.8 / §2.4 mandate a multi-host Schur reduction over
`jax.distributed`. This script proves the path end to end with *real*
process boundaries (gloo collectives between processes — the CPU stand-in
for ICI/DCN):

  - N processes each expose K virtual CPU devices
    (XLA_FLAGS=--xla_force_host_platform_device_count=K)
  - `jax.distributed.initialize` forms the global runtime
  - a global ('sessions','edges') mesh spans all N*K devices
  - `multisession_optimize` runs sharded GN; its psum crosses processes
  - every process verifies its result against a local single-device
    `gn.optimize` of the same sessions (allclose, f32)

Run on a real multi-host v5e slice with the same flags minus the CPU
forcing. Locally:

  python deploy/multihost_smoke.py            # spawns itself twice, asserts
  python deploy/multihost_smoke.py --proc 0 & # or run the ranks by hand
  python deploy/multihost_smoke.py --proc 1
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

N_PROCS = 2
DEV_PER_PROC = 2
COORD = "127.0.0.1:9923"


def worker(proc_id: int) -> int:
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={DEV_PER_PROC}")
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=COORD,
                               num_processes=N_PROCS, process_id=proc_id)
    import numpy as np
    from jax.experimental import multihost_utils
    from jax.sharding import PartitionSpec as P

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from tpuslam.backend import gauss_newton as gn
    from tpuslam.backend.graph import GraphCapacity
    from tpuslam.parallel import (make_slam_mesh, multisession_optimize,
                                  stack_graphs)
    from bench_scaling import _build_session

    n_global = N_PROCS * DEV_PER_PROC
    assert jax.device_count() == n_global, jax.device_count()

    cap = GraphCapacity(max_poses=64, max_landmarks=32, max_obs=512)
    cfg = gn.GNConfig(iterations=3)
    # deterministic same sessions on every process
    graphs = [_build_session(cap, s) for s in range(n_global)]
    stacked = stack_graphs(graphs)

    # sessions axis spans all processes; this process contributes its local
    # slice of the global array
    mesh = make_slam_mesh(n_sessions=n_global, n_edge_shards=1)
    local = jax.tree.map(
        lambda x: np.asarray(x)[proc_id * DEV_PER_PROC:
                                (proc_id + 1) * DEV_PER_PROC], stacked)
    gstacked = jax.tree.map(
        lambda x: multihost_utils.host_local_array_to_global_array(
            x, mesh, P("sessions")), local)

    out = multisession_optimize(gstacked, cfg, mesh)
    got = multihost_utils.process_allgather(out.poses, tiled=True)

    # local single-device oracle
    want = np.stack([np.asarray(gn.optimize(g, cfg).poses) for g in graphs])
    err = float(np.max(np.abs(got - want)))
    ok = bool(np.allclose(got, want, atol=1e-4))

    # ---- fleet tier across the same process boundary: whole blocked SLAM
    # passes (mapping -> closure -> localization) sharded over 'sessions'
    import jax.numpy as jnp
    from tpuslam.frontend.blocked import blocked_core_batched
    from tpuslam.parallel.batch import initial_states
    from tpuslam.parallel.fleet import run_fleet_blocked
    from tpuslam.runtime.config import SlamConfig

    B, T, N = 4, 8, 8
    scfg = SlamConfig(capacity=GraphCapacity(max_poses=16, max_landmarks=16,
                                             max_obs=B * N + 8),
                      max_obs_per_frame=N)
    rngf = np.random.default_rng(7)
    obs = np.zeros((n_global, T, N, 4), np.float32)
    obs[:, :, 0] = np.asarray([10.0, 0.0, 5.0, 1.0])
    obs[:, :, 0, 0] += rngf.normal(0, 0.2, (n_global, T)).astype(np.float32)
    valid = np.zeros((n_global, T, N), bool)
    valid[:, :, 0] = True
    pth = np.stack([np.arange(T, dtype=np.float32), np.zeros(T),
                    np.zeros(T)], -1)
    poses = np.broadcast_to(pth, (n_global, T, 3)).copy()

    fleet_local = (obs[proc_id * DEV_PER_PROC:(proc_id + 1) * DEV_PER_PROC],
                   valid[proc_id * DEV_PER_PROC:(proc_id + 1) * DEV_PER_PROC],
                   poses[proc_id * DEV_PER_PROC:(proc_id + 1) * DEV_PER_PROC])
    st_local = initial_states(scfg.capacity, DEV_PER_PROC)
    g_in = jax.tree.map(
        lambda x: multihost_utils.host_local_array_to_global_array(
            np.asarray(x), mesh, P("sessions")),
        (st_local, *fleet_local))
    fstates, fouts, fdone = run_fleet_blocked(g_in[0], g_in[1], g_in[2],
                                              g_in[3], scfg, mesh, block=B)
    fposes = multihost_utils.process_allgather(fstates.graph.poses,
                                               tiled=True)
    fdone_all = multihost_utils.process_allgather(fdone, tiled=True)
    # unsharded local oracle over all sessions
    ref_states, _, _ = blocked_core_batched(
        initial_states(scfg.capacity, n_global), jnp.asarray(obs),
        jnp.asarray(valid), jnp.asarray(poses), scfg, B)
    want_f = np.asarray(ref_states.graph.poses)
    fleet_ok = bool(np.allclose(fposes, want_f, atol=1e-4)) \
        and bool(np.all(np.asarray(fdone_all) == T))

    print(json.dumps({"proc": proc_id, "devices": n_global,
                      "max_abs_err_vs_single_device": err, "ok": ok,
                      "fleet_blocked_ok": fleet_ok}),
          flush=True)
    jax.distributed.shutdown()
    return 0 if (ok and fleet_ok) else 1


def launcher() -> int:
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--proc", str(i)],
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
        for i in range(N_PROCS)]
    rcs = [p.wait(timeout=600) for p in procs]
    print(json.dumps({"launcher": "done", "return_codes": rcs}))
    return 0 if all(rc == 0 for rc in rcs) else 1


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--proc", type=int, default=None)
    args = ap.parse_args()
    sys.exit(worker(args.proc) if args.proc is not None else launcher())
