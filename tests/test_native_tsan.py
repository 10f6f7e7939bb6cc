"""ThreadSanitizer gate for the threaded native runtime (SURVEY.md §5.2).

The reference's concurrency safety is hand-placed mutexes with no sanitizer
coverage (7 mutexes, detached threads — reference src/slam.hpp:103-126,
src/slam.cpp:94-96, with known residual races catalogued in SURVEY §5.2).
Our only threaded native component is the OD4 multicast endpoint; this test
builds a -fsanitize=thread driver (od4recv_tsan_test.cpp) that hammers the
concurrent surface — receive thread vs send/wait/drain/stats vs close racing
in-flight calls — and fails on any TSan report.
"""
import os
import subprocess

import pytest

_DIR = os.path.join(os.path.dirname(__file__), "..", "tpuslam", "native")


def test_od4recv_under_thread_sanitizer():
    r = subprocess.run(["make", "-C", _DIR, "tsan"], capture_output=True,
                       text=True, timeout=180)
    if r.returncode != 0:
        pytest.skip(f"tsan build unavailable: {r.stderr[-200:]}")
    exe = os.path.abspath(os.path.join(_DIR, "od4recv_tsan_test"))
    env = {**os.environ, "TSAN_OPTIONS": "exitcode=66 halt_on_error=0"}
    proc = subprocess.run([exe], env=env, capture_output=True, text=True,
                          timeout=300)
    if proc.returncode == 2:
        pytest.skip("multicast sockets unavailable in sandbox")
    assert proc.returncode == 0, (proc.returncode, proc.stderr[-4000:])
    assert "TSAN_DRIVER_OK" in proc.stdout
    assert "WARNING: ThreadSanitizer" not in proc.stderr, proc.stderr[-4000:]
