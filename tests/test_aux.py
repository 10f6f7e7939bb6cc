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


def test_od_configuration_parser():
    """OpenDaVINCI configuration-file layer (SURVEY.md §5.6(b)): parse the
    reference's actual usecase/configuration and resolve the attention
    module's view with global < section < section:ID precedence."""
    from tpuslam.runtime.odconfig import (attention_from_od_config,
                                          module_view,
                                          parse_od_configuration)

    ref_path = "/root/reference/usecase/configuration"
    import os
    import pytest
    if not os.path.exists(ref_path):
        pytest.skip("reference usecase/configuration not available")
    text = open(ref_path).read()
    cfg = parse_od_configuration(text)
    # comment stripping + stray `%RANSAC` markers ignored
    assert cfg["global.buffer.numberOfMemorySegments"] == "4"
    view = module_view(cfg, "logic-cfsd18-sensation-attention")
    assert view["connectDistanceThreshold"] == "0.8"
    assert view["senderStamp"] == "116"
    # inherited global keys
    assert view["buffer.memorySegmentSize"] == "2800000"

    acfg, stamp = attention_from_od_config(text)
    assert stamp == 116
    assert acfg.connect_distance_threshold == 0.8
    assert acfg.min_points == 2 and acfg.max_points == 80
    assert acfg.ransac_iterations == 10
    assert acfg.inlier_found_threshold == 80
    assert acfg.dot_threshold == 0.3

    # section:ID override wins over section
    text2 = ("a.k = 1\n"
             "a:7.k = 2\n"
             "global.g = 9\n")
    assert module_view(parse_od_configuration(text2), "a")["k"] == "1"
    assert module_view(parse_od_configuration(text2), "a", 7)["k"] == "2"
