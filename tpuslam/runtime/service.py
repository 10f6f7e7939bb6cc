"""Service shell: wires the bus (live OD4 or .rec replay) into the engine.

Equivalent of the reference's `main()` (reference
src/opendlv-logic-cfsd18-sensation-slam.cpp:49-119): route 7 message IDs to 4
handlers, filtered by senderStamp (`detectConeId` for cone messages,
`estimationId` for pose/yaw — reference :71-108), publish results back.
"""
from __future__ import annotations

import asyncio
from typing import Optional

from tpuslam.core.slam import Slam
from tpuslam.io import envelope as E
from tpuslam.io import messages as M
from tpuslam.io.rec import Player
from tpuslam.runtime.config import SlamConfig
from tpuslam.runtime.metrics import MetricsRegistry

CONE_TYPES = (M.ObjectDirection.ID, M.ObjectDistance.ID, M.ObjectType.ID)
POSE_TYPES = (M.Geolocation.ID,)
SPLIT_POSE_TYPES = (M.GeodeticWgs84Reading.ID, M.GeodeticHeadingReading.ID)
YAW_TYPES = (M.AngularVelocityReading.ID,)
POINT_CLOUD_TYPES = (49,)  # opendlv.proxy.PointCloudReading (odvd:160-166)


class SlamService:
    def __init__(self, cfg: SlamConfig, od4=None,
                 metrics: Optional[MetricsRegistry] = None,
                 attention_cfg=None, lidar_sender_id: Optional[int] = None):
        """`attention_cfg` (tpuslam.perception.AttentionConfig) enables the
        integrated lidar front-end: raw PointCloudReading messages run
        through the cone detector and feed the engine directly — the
        capability the reference delegates to the sibling
        cfsd18-sensation-attention microservice (SURVEY.md §1 dataflow)."""
        self.cfg = cfg
        self.od4 = od4
        self.metrics = metrics or MetricsRegistry()
        self.attention_cfg = attention_cfg
        self.lidar_sender_id = lidar_sender_id
        publish = None
        if od4 is not None:
            publish = lambda msg, ts, stamp: od4.send(msg, ts.micros, stamp)  # noqa: E731
        self.slam = Slam(cfg, publish=publish)

    # ------------------------------------------------------------- dispatch
    def dispatch_envelope(self, env: M.Envelope):
        """senderStamp-filtered routing (reference main :71-108)."""
        dt = env.dataType
        us = env.sampleTimeStamp.micros
        if dt in CONE_TYPES:
            if env.senderStamp != self.cfg.detect_cone_id:
                return
            self.slam.next_cone(E.unpack_message(env), us)
            self.metrics.inc("cone_messages")
        elif dt in POSE_TYPES:
            if env.senderStamp != self.cfg.estimation_id:
                return
            self.slam.next_pose(E.unpack_message(env), us)
            self.metrics.inc("pose_messages")
        elif dt in SPLIT_POSE_TYPES:
            if env.senderStamp != self.cfg.estimation_id:
                return
            self.slam.next_split_pose(E.unpack_message(env), us)
            self.metrics.inc("pose_messages")
        elif dt in YAW_TYPES:
            if env.senderStamp != self.cfg.estimation_id:
                return
            self.slam.next_yaw_rate(E.unpack_message(env), us)
            self.metrics.inc("yaw_messages")
        elif dt in POINT_CLOUD_TYPES and self.attention_cfg is not None:
            if self.lidar_sender_id is not None and \
                    env.senderStamp != self.lidar_sender_id:
                return
            self._process_point_cloud(E.unpack_message(env), us)
            self.metrics.inc("point_cloud_messages")

    def _process_point_cloud(self, msg, sample_us: int):
        """Integrated lidar front-end: PointCloudReading -> cone detection ->
        direct frame ingestion (bypassing the per-cone message hop the
        reference needed between its two microservices)."""
        import numpy as np
        import jax.numpy as jnp
        from tpuslam.perception import detect_cones
        from tpuslam.perception.vlp16 import decode_point_cloud_reading

        points, _ = decode_point_cloud_reading(msg)
        acfg = self.attention_cfg
        cap = getattr(acfg, "point_capacity", 4096)
        if getattr(acfg, "host_prefilter", True):
            # host-side ROI prefilter so a small device capacity holds the
            # relevant sector; with host_prefilter=False the FULL sweep
            # (~30k returns) goes to device and the grid-hash clustering
            # (attention.py) plus in-jit ROI masking handle true point
            # counts — set point_capacity >= the sweep size for that.
            roi = ((np.abs(points[:, 1]) <= acfg.x_boundary)
                   & (points[:, 0] > 0.1) & (points[:, 0] <= acfg.y_boundary))
            points = points[roi]
        pts = np.zeros((cap, 3), dtype=np.float32)
        n = min(len(points), cap)
        pts[:n] = points[:n]
        valid = np.zeros(cap, dtype=bool)
        valid[:n] = True
        cones, ok, n_cones = detect_cones(jnp.asarray(pts), jnp.asarray(valid),
                                          acfg)
        cones = np.asarray(cones)[np.asarray(ok)]
        if len(cones) and self.slam._is_keyframe(sample_us):
            self.slam.process_frame(cones, np.ones(len(cones), bool),
                                    sample_us)

    # --------------------------------------------------------------- replay
    def run_replay(self, rec_path: str, paced: bool = False,
                   speedup: float = 1.0):
        """Replay a .rec recording through the engine (the reference ops
        path via cluon-replay, SURVEY.md §3.5)."""
        player = Player(rec_path)
        with self.metrics.timer("replay_total"):
            player.replay(self.dispatch_envelope, paced=paced, speedup=speedup)
            self.slam.flush()
        self.metrics.set("keyframes", self.slam.keyframes_processed)
        return self.slam

    # ----------------------------------------------------------------- live
    async def run_live(self):
        """Join the OD4 session and process until cancelled; a timer flushes
        pending cone frames for liveness (replaces the reference's detached
        busy-wait collector threads, src/slam.cpp:94-96, 227-233)."""
        assert self.od4 is not None, "run_live needs an OD4Session"
        types = CONE_TYPES + POSE_TYPES + SPLIT_POSE_TYPES + YAW_TYPES
        if self.attention_cfg is not None:
            types = types + POINT_CLOUD_TYPES
        for dt in types:
            self.od4.data_trigger(dt, self.dispatch_envelope)
        await self.od4.start()
        try:
            while True:
                await asyncio.sleep(self.cfg.gathering_time_ms / 1000.0)
                # idle-aware: only closes a frame once no cone message has
                # arrived for a full gathering window (the reference snapshots
                # gatheringTimeMs after the frame's FIRST message; a blind
                # flush here would split frames still streaming off the bus)
                self.slam.flush_if_idle(self.cfg.gathering_time_ms / 1000.0)
        except asyncio.CancelledError:
            pass
        finally:
            await self.od4.stop()


def scenario_to_rec(scenario, path: str, cfg: SlamConfig):
    """Serialize a simulated Scenario as a .rec the service can replay —
    the synthetic stand-in for real CFSD18 recordings."""
    from tpuslam.geometry import wgs84
    import numpy as np

    ref = np.array(cfg.gps_reference)
    with __import__("tpuslam.io.rec", fromlist=["x"]).RecWriter(path) as w:
        for t in range(len(scenario.times)):
            us = int(scenario.times[t] * 1e6)
            latlon = wgs84.from_cartesian(ref, scenario.odom_poses[t][:2])
            w.write_message(
                M.Geolocation(latitude=float(latlon[0]), longitude=float(latlon[1]),
                              heading=float(scenario.odom_poses[t][2])),
                sample_us=us, sender_stamp=cfg.estimation_id)
            w.write_message(
                M.AngularVelocityReading(
                    angularVelocityZ=float(scenario.yaw_rates[t])),
                sample_us=us, sender_stamp=cfg.estimation_id)
            n = int(scenario.obs_valid[t].sum())
            for i in range(n):
                az, zen, dist, ct = scenario.obs[t, i]
                w.write_message(M.ObjectDirection(objectId=i, azimuthAngle=float(az),
                                                  zenithAngle=float(zen)),
                                sample_us=us, sender_stamp=cfg.detect_cone_id)
                w.write_message(M.ObjectDistance(objectId=i, distance=float(dist)),
                                sample_us=us, sender_stamp=cfg.detect_cone_id)
                w.write_message(M.ObjectType(objectId=i, type=int(ct)),
                                sample_us=us, sender_stamp=cfg.detect_cone_id)
