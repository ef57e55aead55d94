"""Camera model.

Parity: /root/reference/gssr/cameras/__init__.py (Camera/MiniCam/CameraInfo).
Differences by design: matrices use the column-vector convention
(p_cam = w2c @ p_world) instead of the reference's transposed row-vector
layout, and the device-side camera is a static-shape NamedTuple pytree
(`CameraArrays`) so a jitted train step can take any camera without
recompilation (images are grouped to a common resolution per dataset).
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import numpy as np

from gssr_tpu.utils.graphics import (
    fov_to_focal,
    projection_matrix,
    world_to_view,
)

ZNEAR = 0.01
ZFAR = 100.0


class CameraArrays(NamedTuple):
    """Static-shape camera pytree for jitted rendering.

    All fields are float32 arrays; image height/width are carried separately
    as static python ints by the caller.
    """
    w2c: np.ndarray          # [4,4] world -> camera
    full_proj: np.ndarray    # [4,4] proj @ w2c
    campos: np.ndarray       # [3]
    # scalars packed as 0-d arrays so the tuple stays a uniform pytree
    fx: np.ndarray
    fy: np.ndarray
    cx: np.ndarray
    cy: np.ndarray
    tan_fovx: np.ndarray
    tan_fovy: np.ndarray


@dataclasses.dataclass
class Camera:
    """Host-side camera: COLMAP pose + (optionally) the GT image."""
    uid: int
    colmap_id: int
    image_name: str
    R: np.ndarray            # [3,3] cam-to-world rotation (COLMAP convention)
    T: np.ndarray            # [3] w2c translation
    fovx: float
    fovy: float
    width: int
    height: int
    image: Optional[np.ndarray] = None       # [H,W,3] float32 in [0,1]
    alpha_mask: Optional[np.ndarray] = None  # [H,W] float32 or None
    image_path: str = ""
    near_ids: tuple = ()     # PGSR multi-view neighbor camera uids
    trans: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(3, dtype=np.float64))
    scale: float = 1.0

    def __post_init__(self):
        self.w2c = world_to_view(self.R, self.T, self.trans, self.scale)
        self.proj = projection_matrix(ZNEAR, ZFAR, self.fovx, self.fovy)
        self.full_proj = (self.proj @ self.w2c).astype(np.float32)
        c2w = np.linalg.inv(self.w2c.astype(np.float64))
        self.campos = c2w[:3, 3].astype(np.float32)
        self.fx = fov_to_focal(self.fovx, self.width)
        self.fy = fov_to_focal(self.fovy, self.height)
        self.cx = 0.5 * self.width
        self.cy = 0.5 * self.height

    @property
    def tan_fovx(self) -> float:
        return float(np.tan(self.fovx * 0.5))

    @property
    def tan_fovy(self) -> float:
        return float(np.tan(self.fovy * 0.5))

    def arrays(self) -> CameraArrays:
        f32 = lambda v: np.asarray(v, dtype=np.float32)
        return CameraArrays(
            w2c=f32(self.w2c),
            full_proj=f32(self.full_proj),
            campos=f32(self.campos),
            fx=f32(self.fx), fy=f32(self.fy),
            cx=f32(self.cx), cy=f32(self.cy),
            tan_fovx=f32(self.tan_fovx), tan_fovy=f32(self.tan_fovy),
        )

    def intrinsics(self) -> np.ndarray:
        return np.array([[self.fx, 0, self.cx],
                         [0, self.fy, self.cy],
                         [0, 0, 1]], dtype=np.float32)


def stack_cameras(cams) -> CameraArrays:
    """Stack a list of cameras into one batched CameraArrays pytree
    (leading axis = camera) for vmapped / shard_mapped rendering."""
    arrs = [c.arrays() for c in cams]
    return CameraArrays(*[np.stack([getattr(a, f) for a in arrs])
                          for f in CameraArrays._fields])
