"""Velodyne calibration XML parser (the reference's usecase/VLP-16.xml).

The reference ships a boost-serialized Velodyne calibration consumed by the
proxy-velodyne16 service (reference usecase/docker-compose.yml:19-28,
usecase/VLP-16.xml — 1,709 lines): a `DB` record with the distance LSB in
centimeters, sensor mounting position/orientation, and 64 per-laser `px`
records (rotCorrection_, vertCorrection_, distCorrection_, offsets...); a
VLP-16 uses the first 16. This module parses that exact format so real
calibrations drive the point-cloud decode instead of the transcribed
constants in tpuslam.perception.vlp16.
"""
from __future__ import annotations

import xml.etree.ElementTree as ET
from dataclasses import dataclass, field

import numpy as np

__all__ = ["Vlp16Calibration", "load_calibration"]


@dataclass
class Vlp16Calibration:
    dist_lsb_m: float                    # meters per distance count
    position_xyz: np.ndarray             # [3] sensor mounting position
    orientation_rpy: np.ndarray          # [3] sensor mounting orientation
    laser_id: np.ndarray                 # [K] int
    rot_correction_deg: np.ndarray       # [K]
    vert_correction_deg: np.ndarray      # [K]
    dist_correction_m: np.ndarray        # [K]
    vert_offset_m: np.ndarray            # [K]
    horiz_offset_m: np.ndarray           # [K]
    min_intensity: np.ndarray = field(default_factory=lambda: np.zeros(0))
    max_intensity: np.ndarray = field(default_factory=lambda: np.zeros(0))

    @property
    def n_lasers(self) -> int:
        return len(self.laser_id)

    def elevations_for_channels(self, channels: int = 16) -> np.ndarray:
        """Vertical angles in *firing order* for the first `channels` lasers
        (VLP-16 packets index channels by firing order = laser id)."""
        order = np.argsort(self.laser_id[:channels])
        return self.vert_correction_deg[:channels][order]


def _floats(node, tag):
    sub = node.find(tag)
    if sub is None:
        return np.zeros(0)
    return np.array([float(i.text) for i in sub.findall("item")
                     if i.text is not None])


def load_calibration(path: str) -> Vlp16Calibration:
    """Parse a boost-serialized Velodyne calibration XML."""
    root = ET.parse(path).getroot()
    db = root.find("DB")
    if db is None:
        raise ValueError("not a Velodyne calibration file (no DB node)")
    dist_lsb_cm = float(db.findtext("distLSB_", default="0.2"))

    pos = db.find("position_/xyz")
    position = np.array([float(i.text) for i in pos.findall("item")]) \
        if pos is not None else np.zeros(3)
    rpy = db.find("orientation_/rpy")
    orientation = np.array([float(i.text) for i in rpy.findall("item")]) \
        if rpy is not None else np.zeros(3)

    ids, rot, vert, dist, voff, hoff = [], [], [], [], [], []
    points = db.find("points_")
    if points is not None:
        for item in points.findall("item"):
            px = item.find("px")
            if px is None:
                continue
            ids.append(int(px.findtext("id_", default="0")))
            rot.append(float(px.findtext("rotCorrection_", default="0")))
            vert.append(float(px.findtext("vertCorrection_", default="0")))
            # distance corrections are centimeters in the Velodyne format
            dist.append(float(px.findtext("distCorrection_", default="0")) / 100.0)
            voff.append(float(px.findtext("vertOffsetCorrection_", default="0")) / 100.0)
            hoff.append(float(px.findtext("horizOffsetCorrection_", default="0")) / 100.0)

    min_i = _floats(db, "minIntensity_")
    max_i = _floats(db, "maxIntensity_")
    return Vlp16Calibration(
        dist_lsb_m=dist_lsb_cm / 100.0,
        position_xyz=position, orientation_rpy=orientation,
        laser_id=np.asarray(ids, np.int32),
        rot_correction_deg=np.asarray(rot),
        vert_correction_deg=np.asarray(vert),
        dist_correction_m=np.asarray(dist),
        vert_offset_m=np.asarray(voff),
        horiz_offset_m=np.asarray(hoff),
        min_intensity=min_i, max_intensity=max_i,
    )
