"""The Slam orchestrator — host-side shell around the device-resident engine.

Mirrors the reference `Slam` class surface (reference src/slam.hpp:43-137):
`next_cone` / `next_pose` / `next_split_pose` / `next_yaw_rate` ingest plus
`draw_cones` / `draw_poses` / `draw_current_pose` / `draw_graph` introspection.

Redesign vs the reference:
- The reference assembles cone frames by spawning a detached thread per frame
  that busy-waits `gatheringTimeMs` then snapshots a mutex-guarded matrix
  (reference src/slam.cpp:94-96, 221-257 — one spinning core per frame, racy
  under overlap). Here frame assembly is deterministic and data-driven: a
  frame closes when a message's *sample time* passes the gathering window (or
  on explicit flush), so replays are bit-reproducible and there are no
  threads or mutexes at all.
- Keyframe gating uses sample time, not wall clock (reference src/slam.cpp:
  286-295 uses wall clock, so its output depends on host load).
- All SLAM state is one device pytree; the hot path is a single jit call
  (tpuslam.frontend.keyframe.perform_keyframe).
"""
from __future__ import annotations

import time as _time
from typing import Callable, Optional

import numpy as np
import jax.numpy as jnp

from tpuslam import compat
from tpuslam.frontend.keyframe import perform_keyframe
from tpuslam.frontend.state import initial_state
from tpuslam.geometry import wgs84
from tpuslam.io import messages as M
from tpuslam.runtime.config import SlamConfig

COLLECTOR_CAPACITY = 1000  # reference resets to 4x1000 (src/slam.cpp:244)


class Slam:
    def __init__(self, cfg: SlamConfig, publish: Optional[Callable] = None):
        self.cfg = cfg
        self.publish = publish
        self.state = initial_state(cfg.capacity)
        self._gps_ref = np.array([cfg.ref_latitude, cfg.ref_longitude])

        # odometry state (reference m_odometryData, m_yawRate and timestamps)
        self._odometry = np.zeros(3)
        self._yaw_rate = 0.0
        self._yaw_received_us = 0
        self._geolocation_received_us = 0

        # cone collector (reference m_coneCollector / m_lastObjectId / m_newFrame)
        self._collector = np.zeros((4, COLLECTOR_CAPACITY))
        self._collector_seen = np.zeros(COLLECTOR_CAPACITY, dtype=bool)
        self._last_object_id = -1
        self._frame_open = False
        self._frame_start_us = 0
        self._last_cone_us = 0
        self._last_cone_wall = 0.0
        # odometry snapshot for the open frame: the reference samples
        # m_odometryData at the END of the gathering window (src/slam.cpp:
        # 304-307); in sample-time terms that is the latest odometry whose
        # sample time falls inside the window, NOT whatever arrives later in
        # file order — crucial for deterministic as-fast-as-possible replay.
        self._frame_pose = np.zeros(3)
        self._frame_yaw_rate = 0.0
        self._frame_yaw_us = 0
        self._keyframe_us: Optional[int] = None
        self.last_outputs = None
        self.keyframes_processed = 0

        # optional message-rate CTRV EKF (cfg.use_ekf_fusion)
        self._ekf = None
        self._ekf_us: Optional[int] = None

    # ------------------------------------------------------------ EKF fusion
    def _ekf_predict_to(self, sample_us: int):
        from tpuslam.frontend import motion
        if self._ekf is None:
            self._ekf = motion.ekf_init(jnp.asarray(self._odometry, jnp.float32))
            self._ekf_us = sample_us
            return
        dt = (sample_us - (self._ekf_us or sample_us)) / 1e6
        if 0.0 < dt < 1.0:
            self._ekf = motion.ekf_predict(self._ekf, dt)
        self._ekf_us = max(self._ekf_us or sample_us, sample_us)

    # ------------------------------------------------------------ ingest API
    def _in_gathering_window(self, sample_us: int) -> bool:
        return self._frame_open and \
            sample_us <= self._frame_start_us + self.cfg.gathering_time_ms * 1000

    def _sync_frame_snapshot(self, sample_us: int):
        if self._in_gathering_window(sample_us):
            self._frame_pose[:] = self._odometry
            self._frame_yaw_rate = self._yaw_rate
            self._frame_yaw_us = self._yaw_received_us

    def next_pose(self, msg: M.Geolocation, sample_us: int):
        """Fused Geolocation odometry (reference src/slam.cpp:186-210)."""
        self._geolocation_received_us = sample_us
        xy = wgs84.to_cartesian(self._gps_ref, np.array([msg.latitude, msg.longitude]))
        self._odometry[:] = (xy[0], xy[1], msg.heading)
        if self.cfg.use_ekf_fusion:
            from tpuslam.frontend import motion
            self._ekf_predict_to(sample_us)
            self._ekf = motion.ekf_update_position(
                self._ekf, jnp.asarray(xy, jnp.float32),
                std=self.cfg.gps_prior_std)
            self._ekf = motion.ekf_update_heading(self._ekf, msg.heading)
        self._sync_frame_snapshot(sample_us)

    def next_split_pose(self, msg, sample_us: int):
        """Split GPS / heading messages (reference src/slam.cpp:154-184)."""
        if isinstance(msg, M.GeodeticWgs84Reading):
            xy = wgs84.to_cartesian(self._gps_ref,
                                    np.array([msg.latitude, msg.longitude]))
            self._odometry[0], self._odometry[1] = xy[0], xy[1]
        elif isinstance(msg, M.GeodeticHeadingReading):
            h = msg.northHeading
            if self.cfg.reference_compat:
                h = float(compat.remap_north_heading(np.float64(h)))
            self._odometry[2] = h
        else:
            raise TypeError(f"unexpected split-pose message {type(msg)}")
        self._sync_frame_snapshot(sample_us)

    def next_yaw_rate(self, msg: M.AngularVelocityReading, sample_us: int):
        """IMU yaw rate, pre-scaled like the reference (src/slam.cpp:212-219)."""
        self._yaw_rate = msg.angularVelocityZ * self.cfg.yaw_rate_scale
        self._yaw_received_us = sample_us
        if self.cfg.use_ekf_fusion:
            from tpuslam.frontend import motion
            self._ekf_predict_to(sample_us)
            # the EKF fuses the *raw* rate — the /4 scaling is a compat quirk
            self._ekf = motion.ekf_update_yaw_rate(self._ekf,
                                                   msg.angularVelocityZ)
        self._sync_frame_snapshot(sample_us)

    def next_cone(self, msg, sample_us: int):
        """Interleaved ObjectDirection/Distance/Type accumulation
        (reference src/slam.cpp:67-152)."""
        if self._frame_open and \
                sample_us - self._frame_start_us > self.cfg.gathering_time_ms * 1000:
            self._close_frame()
        self._last_cone_us = sample_us
        self._last_cone_wall = _time.monotonic()
        if not self._frame_open:
            self._frame_open = True
            self._frame_start_us = sample_us
            self._frame_pose[:] = self._odometry
            self._frame_yaw_rate = self._yaw_rate
            self._frame_yaw_us = self._yaw_received_us
        oid = msg.objectId
        if oid >= COLLECTOR_CAPACITY:
            return
        self._last_object_id = max(self._last_object_id, oid)
        self._collector_seen[oid] = True
        if isinstance(msg, M.ObjectDirection):
            self._collector[0, oid] = msg.azimuthAngle
            self._collector[1, oid] = msg.zenithAngle
        elif isinstance(msg, M.ObjectDistance):
            self._collector[2, oid] = msg.distance
        elif isinstance(msg, M.ObjectType):
            self._collector[3, oid] = msg.type
        else:
            raise TypeError(f"unexpected cone message {type(msg)}")

    def flush(self):
        """Close any pending frame (end of stream / timer liveness)."""
        if self._frame_open:
            self._close_frame()

    def flush_if_idle(self, idle_s: float):
        """Close a pending frame only once no cone message has arrived for
        `idle_s` wall-clock seconds. This is the live-bus analogue of the
        reference's collector thread, which snapshots gatheringTimeMs AFTER
        the frame's first message (src/slam.cpp:227-241) — an unconditional
        timer flush would split frames still streaming in off the bus."""
        if self._frame_open and \
                _time.monotonic() - self._last_cone_wall >= idle_s:
            self._close_frame()

    # ------------------------------------------------------ frame processing
    def _close_frame(self):
        n = self._last_object_id + 1
        obs = self._collector[:, :n].T.copy()  # [n, 4]
        self._collector[:, :max(n, 1)] = 0.0
        self._collector_seen[:max(n, 1)] = False
        self._last_object_id = -1
        self._frame_open = False
        if n > 0 and self._is_keyframe(self._last_cone_us):
            valid = np.ones(n, dtype=bool)
            self.process_frame(obs, valid, self._last_cone_us,
                               pose_override=self._frame_pose.copy(),
                               yaw_override=(self._frame_yaw_rate,
                                             self._frame_yaw_us))

    def _is_keyframe(self, now_us: int) -> bool:
        """Sample-time keyframe gate (reference src/slam.cpp:286-295)."""
        if self._keyframe_us is None or \
                abs(now_us - self._keyframe_us) / 1000.0 > self.cfg.time_between_keyframes_ms:
            self._keyframe_us = now_us
            return True
        return False

    def process_frame(self, obs: np.ndarray, valid: np.ndarray, sample_us: int,
                      pose_override=None, yaw_override=None):
        """Run one keyframe update on an assembled observation frame.

        obs [n, 4] rows of (azimuth_deg, zenith_deg, distance, type).
        Direct entry point for replay/sim drivers (bypasses the collector).
        """
        cfg = self.cfg
        n_max = cfg.max_obs_per_frame
        obs_pad = np.zeros((n_max, 4), dtype=np.float32)
        valid_pad = np.zeros(n_max, dtype=bool)
        n = min(len(obs), n_max)
        obs_pad[:n] = obs[:n]
        valid_pad[:n] = valid[:n]

        if self.cfg.use_ekf_fusion and self._ekf is not None:
            self._ekf_predict_to(sample_us)
            pose = np.asarray(self._ekf.x[:3], dtype=np.float64).copy()
        else:
            pose = (self._odometry if pose_override is None
                    else pose_override).copy()
            yaw_rate, yaw_us = ((self._yaw_rate, self._yaw_received_us)
                                if yaw_override is None else yaw_override)
            # yaw-rate heading correction (reference src/slam.cpp:309-317)
            dt = abs(yaw_us - sample_us) / 1e6
            if 0.0 < dt < 1.0:
                pose[2] -= yaw_rate * dt

        self.state, outputs = perform_keyframe(
            self.state, jnp.asarray(obs_pad), jnp.asarray(valid_pad),
            jnp.asarray(pose, jnp.float32), cfg)
        self.last_outputs = outputs
        self.keyframes_processed += 1
        if self.publish is not None:
            self._publish(outputs)
        return outputs

    # ------------------------------------------------------------ publishing
    def _publish(self, outputs):
        if not bool(outputs.send):
            return
        sample = M.TimeStamp.from_micros(self._geolocation_received_us)
        pose = np.asarray(outputs.pose, dtype=np.float64)
        latlon = wgs84.from_cartesian(self._gps_ref, pose[:2])
        # NOTE the reference swaps lon/lat into the outbound Geolocation
        # (src/slam.cpp:688-690 assigns sendGPS[0]->longitude, [1]->latitude,
        # where fromCartesian returns [lat, lon]); we publish correctly.
        geo = M.Geolocation(latitude=float(latlon[0]), longitude=float(latlon[1]),
                            heading=float(pose[2]))
        out = [(geo, sample, self.cfg.sender_id)]
        az = np.asarray(outputs.cone_azimuth)
        dist = np.asarray(outputs.cone_distance)
        ctype = np.asarray(outputs.cone_type)
        for i in range(self.cfg.cones_per_packet):
            out.append((M.ObjectDirection(objectId=i, azimuthAngle=float(az[i]),
                                          zenithAngle=0.0), sample, self.cfg.sender_id))
            out.append((M.ObjectDistance(objectId=i, distance=float(dist[i])),
                        sample, self.cfg.sender_id))
            out.append((M.ObjectType(objectId=i, type=int(ctype[i])),
                        sample, self.cfg.sender_id))
        for item in out:
            self.publish(*item)

    # ------------------------------------------------- introspection (viewer)
    def draw_cones(self):
        g = self.state.graph
        n = int(g.n_landmarks)
        return (np.asarray(g.lm_xy)[:n].copy(), np.asarray(g.lm_type)[:n].copy())

    def draw_poses(self):
        g = self.state.graph
        return np.asarray(g.poses)[: int(g.n_poses)].copy()

    def draw_current_pose(self):
        if bool(self.state.loop_closure_complete) and self.last_outputs is not None:
            return np.asarray(self.last_outputs.pose).copy()
        return self._odometry.copy()

    def draw_graph(self):
        """Pose->landmark connectivity (reference m_connectivityGraph)."""
        g = self.state.graph
        n = int(g.n_obs)
        return (np.asarray(g.obs_pose)[:n].copy(), np.asarray(g.obs_lm)[:n].copy())

    # ------------------------------------------------------ checkpoint/resume
    def snapshot_host(self) -> dict:
        """Host-side ingest state for exact mid-run resume (the device state
        lives in `self.state` and is captured by runtime.checkpoint). The
        reference has no resume at all — its substitute is replaying the
        whole .rec from t=0 (SURVEY.md §5.4)."""
        snap = {
            "odometry": [float(v) for v in self._odometry],
            "yaw_rate": float(self._yaw_rate),
            "yaw_received_us": int(self._yaw_received_us),
            "geolocation_received_us": int(self._geolocation_received_us),
            "keyframe_us": (None if self._keyframe_us is None
                            else int(self._keyframe_us)),
            "keyframes_processed": int(self.keyframes_processed),
            # mid-gathering-window collector state (live ingest path)
            "frame_open": bool(self._frame_open),
            "frame_start_us": int(self._frame_start_us),
            "last_cone_us": int(self._last_cone_us),
            "last_object_id": int(self._last_object_id),
            "collector": np.asarray(self._collector).tolist(),
            "collector_seen": np.asarray(self._collector_seen).tolist(),
            "frame_pose": [float(v) for v in self._frame_pose],
            "frame_yaw_rate": float(self._frame_yaw_rate),
            "frame_yaw_us": int(self._frame_yaw_us),
        }
        if self._ekf is not None:
            snap["ekf"] = {"x": np.asarray(self._ekf.x).tolist(),
                           "p": np.asarray(self._ekf.p).tolist()}
            snap["ekf_us"] = int(self._ekf_us)
        return snap

    def restore_host(self, snap: dict):
        """Restore what `snapshot_host` captured; pair with assigning the
        checkpointed device state to `self.state`."""
        self._odometry[:] = snap["odometry"]
        self._yaw_rate = snap["yaw_rate"]
        self._yaw_received_us = snap["yaw_received_us"]
        self._geolocation_received_us = snap["geolocation_received_us"]
        self._keyframe_us = snap["keyframe_us"]
        self.keyframes_processed = snap["keyframes_processed"]
        if "frame_open" in snap:
            self._frame_open = snap["frame_open"]
            self._frame_start_us = snap["frame_start_us"]
            self._last_cone_us = snap["last_cone_us"]
            self._last_object_id = snap["last_object_id"]
            self._collector[:] = np.asarray(snap["collector"])
            self._collector_seen[:] = np.asarray(snap["collector_seen"])
            self._frame_pose[:] = snap["frame_pose"]
            self._frame_yaw_rate = snap["frame_yaw_rate"]
            self._frame_yaw_us = snap["frame_yaw_us"]
        if "ekf" in snap:
            from tpuslam.frontend.motion import Ekf
            self._ekf = Ekf(
                x=jnp.asarray(np.asarray(snap["ekf"]["x"]), jnp.float32),
                p=jnp.asarray(np.asarray(snap["ekf"]["p"]), jnp.float32))
            self._ekf_us = snap["ekf_us"]

    # --------------------------------------------------------------- helpers
    @property
    def loop_closure_complete(self) -> bool:
        return bool(self.state.loop_closure_complete)

    def run_scenario(self, scenario, use_ekf_heading=False):
        """Drive the engine from a simulated Scenario; returns trajectory.

        Feeds odometry + frames in sample-time order, like a paced replay.
        """
        est = []
        for t in range(len(scenario.times)):
            us = int(scenario.times[t] * 1e6)
            self.next_pose(_geo_from_local(self._gps_ref, scenario.odom_poses[t]), us)
            self.next_yaw_rate(
                M.AngularVelocityReading(angularVelocityZ=float(scenario.yaw_rates[t])), us)
            out = self.process_frame(scenario.obs[t], scenario.obs_valid[t], us)
            est.append(np.asarray(out.pose))
        return np.stack(est)


def _geo_from_local(gps_ref, pose):
    latlon = wgs84.from_cartesian(gps_ref, np.asarray(pose[:2], dtype=np.float64))
    return M.Geolocation(latitude=float(latlon[0]), longitude=float(latlon[1]),
                         heading=float(pose[2]))
