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


class SlamService:
    def __init__(self, cfg: SlamConfig, od4=None,
                 metrics: Optional[MetricsRegistry] = None):
        self.cfg = cfg
        self.od4 = od4
        self.metrics = metrics or MetricsRegistry()
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
        for dt in CONE_TYPES + POSE_TYPES + SPLIT_POSE_TYPES + YAW_TYPES:
            self.od4.data_trigger(dt, self.dispatch_envelope)
        await self.od4.start()
        try:
            while True:
                await asyncio.sleep(self.cfg.gathering_time_ms / 1000.0)
                self.slam.flush()
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
