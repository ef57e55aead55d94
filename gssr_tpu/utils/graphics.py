"""Projection / view matrices and depth<->point<->normal chains.

Parity: /root/reference/gssr/utils/graphics_utils.py — same matrix
conventions (row-vector convention: points @ M, world_view_transform is the
transpose of the usual w2c) so that COLMAP scenes render identically.
Host-side matrix builders are numpy; per-pixel chains are jnp.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def fov_to_focal(fov: float, pixels: float) -> float:
    return pixels / (2.0 * math.tan(fov / 2.0))


def focal_to_fov(focal: float, pixels: float) -> float:
    return 2.0 * math.atan(pixels / (2.0 * focal))


def world_to_view(R: np.ndarray, t: np.ndarray, translate=np.zeros(3),
                  scale: float = 1.0) -> np.ndarray:
    """4x4 world->camera (untransposed). R is cam-to-world rotation, t is
    w2c translation — the COLMAP qvec/tvec convention the reference uses
    (graphics_utils.getWorld2View2)."""
    Rt = np.zeros((4, 4), dtype=np.float64)
    Rt[:3, :3] = R.transpose()
    Rt[:3, 3] = t
    Rt[3, 3] = 1.0
    C2W = np.linalg.inv(Rt)
    C2W[:3, 3] = (C2W[:3, 3] + translate) * scale
    return np.linalg.inv(C2W).astype(np.float32)


def projection_matrix(znear: float, zfar: float, fovx: float, fovy: float) -> np.ndarray:
    """OpenGL-style perspective with z in [0,1] (graphics_utils.getProjectionMatrix)."""
    tan_y = math.tan(fovy / 2.0)
    tan_x = math.tan(fovx / 2.0)
    top, right = tan_y * znear, tan_x * znear
    P = np.zeros((4, 4), dtype=np.float32)
    P[0, 0] = znear / right
    P[1, 1] = znear / top
    P[3, 2] = 1.0
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    return P


def projection_matrix_center_shift(znear, zfar, cx, cy, fx, fy, w, h) -> np.ndarray:
    """Principal-point-aware perspective (graphics_utils.getProjectionMatrixCenterShift)."""
    top = cy / fy * znear
    bottom = -(h - cy) / fy * znear
    left = -(w - cx) / fx * znear
    right = cx / fx * znear
    P = np.zeros((4, 4), dtype=np.float32)
    P[0, 0] = 2.0 * znear / (right - left)
    P[1, 1] = 2.0 * znear / (top - bottom)
    P[0, 2] = (right + left) / (right - left)
    P[1, 2] = (top + bottom) / (top - bottom)
    P[3, 2] = 1.0
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    return P


def intrinsic_matrix(fx, fy, cx, cy) -> np.ndarray:
    return np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], dtype=np.float32)


# ---------------------------------------------------------------------------
# Depth -> camera-space points -> normals (used by 2DGS / PGSR losses).
# ---------------------------------------------------------------------------

def depth_to_points_cam(depth, fx, fy, cx, cy):
    """[H, W] depth -> [H, W, 3] camera-space points via pinhole unprojection."""
    H, W = depth.shape
    xs = (jnp.arange(W, dtype=jnp.float32) - cx) / fx
    ys = (jnp.arange(H, dtype=jnp.float32) - cy) / fy
    gx, gy = jnp.meshgrid(xs, ys)
    return jnp.stack([gx * depth, gy * depth, depth], axis=-1)


def points_to_normal(points):
    """[H, W, 3] points -> [H, W, 3] unit normals via central differences.

    Cross(left->right, bottom->top), matching the reference's
    depth_pcd2normal orientation; 1px border is zero.
    """
    dzdx = points[1:-1, 2:, :] - points[1:-1, :-2, :]      # left -> right
    dzdy = points[:-2, 1:-1, :] - points[2:, 1:-1, :]      # bottom -> top
    n = jnp.cross(dzdx, dzdy)
    n = n * jax.lax.rsqrt(jnp.sum(n * n, axis=-1, keepdims=True) + 1e-12)
    return jnp.pad(n, ((1, 1), (1, 1), (0, 0)))


def normal_from_depth(depth, fx, fy, cx, cy):
    return points_to_normal(depth_to_points_cam(depth, fx, fy, cx, cy))
