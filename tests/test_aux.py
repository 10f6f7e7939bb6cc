"""Coverage for the auxiliary subsystems PARITY.md lists without tests:
time helpers, tracing/profiling hooks, and the scaling-harness graph builder.
"""
import glob
import os

import jax.numpy as jnp

from tpuslam.io.envelope import now_us
from tpuslam.io.messages import TimeStamp
from tpuslam.runtime.tracing import annotate_fn, stage, trace_session


def test_timestamp_micro_roundtrip():
    # cluon::time semantics (reference cluon-complete-build.hpp:4462-4519):
    # seconds + microseconds, microsecond arithmetic end to end
    ts = TimeStamp.from_micros(1_234_567_890)
    assert (ts.seconds, ts.microseconds) == (1234, 567890)
    assert ts.micros == 1_234_567_890
    assert TimeStamp.from_micros(0).micros == 0
    assert TimeStamp.from_micros(999_999).micros == 999_999


def test_now_us_monotone_nondecreasing():
    a = now_us()
    b = now_us()
    assert isinstance(a, int) and b >= a > 1_500_000_000_000_000  # after 2017


def test_stage_and_annotate_passthrough():
    with stage("unit-test-stage"):
        x = jnp.sum(jnp.arange(4.0))

    @annotate_fn("named-region")
    def f(v):
        return v + 1

    assert f.__name__ == "f"
    assert float(f(x)) == 7.0


def test_trace_session_writes_profile(tmp_path):
    logdir = str(tmp_path / "trace")
    with trace_session(logdir):
        jnp.dot(jnp.ones((8, 8)), jnp.ones((8, 8))).block_until_ready()
    produced = glob.glob(os.path.join(logdir, "**", "*"), recursive=True)
    assert any(os.path.isfile(p) for p in produced)


def test_scaling_harness_session_builder():
    from bench_scaling import _build_session
    from tpuslam.backend import gauss_newton as gn
    from tpuslam.backend.graph import GraphCapacity

    cap = GraphCapacity(max_poses=32, max_landmarks=16, max_obs=256)
    g = _build_session(cap, seed=3)
    assert int(g.n_poses) == 16 and int(g.n_landmarks) == 8
    assert int(g.n_obs) > 0
    # the synthetic session must be optimizable (finite chi2 decrease)
    cfg = gn.GNConfig(iterations=2)
    c0 = float(gn.chi2(g, cfg))
    g2 = gn.optimize(g, cfg)
    c1 = float(gn.chi2(g2, cfg))
    assert jnp.isfinite(c1) and c1 <= c0
