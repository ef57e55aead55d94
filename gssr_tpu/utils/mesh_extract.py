"""Mesh extraction from trained scenes (GaussianExtractor equivalent).

Parity: /root/reference/gssr/utils/mesh_utils.py — render all training
cameras, TSDF-fuse the per-view depth maps (bounded voxel grid, or
contracted space for unbounded scenes), marching-tetrahedra surface,
largest-cluster post-process. open3d/trimesh are replaced by the in-repo
TSDF (utils/tsdf.py) and mesh ops (utils/mtet.py).
"""
from __future__ import annotations

import os
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gssr_tpu.utils.tsdf import (
    TSDFVolume,
    contract,
    integrate_jit,
    make_volume,
    uncontract,
)


def _depth_of(out):
    for name in ("surf_depth", "plane_depth", "depth_expected"):
        if hasattr(out, name):
            return getattr(out, name)
    raise ValueError(
        "render output has no depth map; mesh extraction needs a "
        "2DGS/PGSR-family method")


class GaussianExtractor:
    """Render-all-cameras capture + TSDF fusion (mesh_utils.py:92-277)."""

    def __init__(self, scene, state):
        self.scene = scene
        self.state = state
        self.rgbmaps: List[np.ndarray] = []
        self.depthmaps: List[np.ndarray] = []
        self.alphamaps: List[np.ndarray] = []
        self.normalmaps: List[np.ndarray] = []
        self.cameras = []

    def reconstruction(self, cameras):
        self.cameras = list(cameras)
        for cam in self.cameras:
            out = self.scene.eval_render(self.state, cam, step=10 ** 9)
            self.rgbmaps.append(np.asarray(out.image))
            self.depthmaps.append(np.asarray(_depth_of(out)))
            self.alphamaps.append(np.asarray(out.alpha))
            self.normalmaps.append(np.asarray(
                getattr(out, "normal", np.zeros_like(np.asarray(out.image)))))

    def estimate_bounding_sphere(self):
        centers = np.stack([c.campos for c in self.cameras])
        center = centers.mean(axis=0)
        radius = float(np.linalg.norm(centers - center, axis=1).min())
        return center, radius

    def extract_mesh_bounded(self, voxel_size=0.004, sdf_trunc=0.02,
                             depth_trunc=3.0, bound_scale: float = 1.0,
                             alpha_thres: float = 0.5):
        center, radius = self.estimate_bounding_sphere()
        half = depth_trunc * bound_scale * 0.5
        dims = int(np.ceil(2 * half / voxel_size))
        dims = min(dims, 768)
        origin = center - half
        vol = make_volume(origin, (dims, dims, dims), voxel_size, sdf_trunc)
        for cam, depth, rgb, alpha in zip(self.cameras, self.depthmaps,
                                          self.rgbmaps, self.alphamaps):
            vol = integrate_jit(
                vol, jnp.asarray(depth), jnp.asarray(rgb),
                jnp.asarray(cam.w2c), jnp.asarray(cam.fx),
                jnp.asarray(cam.fy), jnp.asarray(cam.cx),
                jnp.asarray(cam.cy), depth_trunc=float(depth_trunc),
                alpha=jnp.asarray(alpha), alpha_thres=alpha_thres)
        from gssr_tpu.utils.tsdf import extract_mesh
        return extract_mesh(vol)

    def _fuse_points(self, pts_world, center, radius, trunc_c,
                     alpha_thres: float, with_rgb: bool):
        """TSDF-fuse arbitrary world points over all captured views with
        BILINEAR depth/rgb/alpha sampling (the reference grid_samples both,
        mesh_utils.py:203-204; r2 rounded to nearest — VERDICT weakness #6).
        Returns (tsdf, rgb or None, weight), each shaped like pts_world[...,0].
        """
        from gssr_tpu.ops.sampling import bilinear_sample

        shape = pts_world.shape[:-1]
        pts = pts_world.reshape(-1, 3)
        mag = jnp.linalg.norm((pts - center) / radius, axis=-1)
        scale = jnp.where(mag > 1.0, 1.0 / (mag * mag), 1.0) / radius

        @jax.jit
        def step(tsdf, rgbacc, weight, depth, rgb, alpha, w2c, fx, fy,
                 cx, cy):
            H, W = depth.shape
            cam = pts @ w2c[:3, :3].T + w2c[:3, 3]
            z = cam[..., 2]
            zs = jnp.where(z != 0, z, 1.0)
            u = cam[..., 0] * fx / zs + cx
            v = cam[..., 1] * fy / zs + cy
            uv = jnp.stack([u, v], axis=-1)
            in_img = (u >= 0) & (u <= W - 1) & (v >= 0) & (v <= H - 1) \
                & (z > 0)
            d = bilinear_sample(depth, uv)
            a = bilinear_sample(alpha, uv)
            ok = in_img & (d > 0) & (a > alpha_thres)
            # sdf in contracted units: world-space sdf x local contraction
            # scale (adaptive truncation, reference mesh_utils.py:212-217)
            sdf_c = jnp.clip((d - z) * scale / trunc_c, -1.0, 1.0)
            upd = ok & (sdf_c > -1.0)
            w_new = jnp.where(upd, 1.0, 0.0)
            wsum = weight + w_new
            wsafe = jnp.maximum(wsum, 1e-8)
            tsdf = jnp.where(upd, (tsdf * weight + sdf_c) / wsafe, tsdf)
            if rgbacc is not None:
                c = jnp.stack([bilinear_sample(rgb[..., i], uv)
                               for i in range(3)], axis=-1)
                rgbacc = jnp.where(upd[:, None],
                                   (rgbacc * weight[:, None] + c)
                                   / wsafe[:, None], rgbacc)
            return tsdf, rgbacc, wsum

        n = pts.shape[0]
        tsdf = jnp.ones((n,), jnp.float32)
        weight = jnp.zeros((n,), jnp.float32)
        rgbacc = jnp.zeros((n, 3), jnp.float32) if with_rgb else None
        for cam, depth, rgb, alpha in zip(self.cameras, self.depthmaps,
                                          self.rgbmaps, self.alphamaps):
            tsdf, rgbacc, weight = step(
                tsdf, rgbacc, weight, jnp.asarray(depth), jnp.asarray(rgb),
                jnp.asarray(alpha), jnp.asarray(cam.w2c),
                jnp.asarray(cam.fx), jnp.asarray(cam.fy),
                jnp.asarray(cam.cx), jnp.asarray(cam.cy))
        tsdf = tsdf.reshape(shape)
        weight = weight.reshape(shape)
        if with_rgb:
            return tsdf, rgbacc.reshape(shape + (3,)), weight
        return tsdf, None, weight

    def extract_mesh_unbounded(self, resolution: int = 512,
                               alpha_thres: float = 0.5):
        """Contracted-space fusion (mesh_utils.py:181-277): the grid lives
        in contracted coordinates; every cell is un-contracted to world and
        projected into each view with bilinear depth sampling. Vertex
        colors are fused at the extracted vertex positions afterwards
        (the reference's 'texturing mesh' pass, mesh_utils.py:272-276) —
        memory-light vs carrying a full NxNxNx3 color volume.
        Returns (verts, faces, vertex_colors)."""
        center, radius = self.estimate_bounding_sphere()
        center = jnp.asarray(center, jnp.float32)
        N = min(resolution, 512)
        lin = jnp.linspace(-2.0, 2.0, N)
        gx, gy, gz = jnp.meshgrid(lin, lin, lin, indexing="ij")
        grid_c = jnp.stack([gx, gy, gz], axis=-1)
        pts_world = uncontract(grid_c, center, radius)
        trunc_c = 2.0 * 4.0 / N    # ~2 voxels in contracted units

        tsdf, _, weight = self._fuse_points(pts_world, center, radius,
                                            trunc_c, alpha_thres,
                                            with_rgb=False)

        from gssr_tpu.utils.mtet import marching_tetrahedra_blocked
        verts_c, faces = marching_tetrahedra_blocked(
            np.asarray(tsdf), level=0.0,
            spacing=(4.0 / (N - 1),) * 3, origin=(-2.0, -2.0, -2.0),
            mask=np.asarray(weight) > 0)
        if len(verts_c):
            verts = np.asarray(uncontract(jnp.asarray(verts_c, jnp.float32),
                                          center, radius))
            _, colors, _ = self._fuse_points(
                jnp.asarray(verts, jnp.float32), center, radius, trunc_c,
                alpha_thres, with_rgb=True)
            colors = np.clip(np.asarray(colors), 0.0, 1.0)
        else:
            verts = verts_c
            colors = np.zeros((0, 3), np.float32)
        return verts, faces, colors

    def export_images(self, out_dir: str):
        from PIL import Image
        os.makedirs(os.path.join(out_dir, "renders"), exist_ok=True)
        os.makedirs(os.path.join(out_dir, "depth"), exist_ok=True)
        for i, (rgb, depth) in enumerate(zip(self.rgbmaps, self.depthmaps)):
            Image.fromarray((np.clip(rgb, 0, 1) * 255).astype(np.uint8)
                            ).save(os.path.join(out_dir, "renders",
                                                f"{i:05d}.png"))
            d = depth / (depth.max() + 1e-9)
            Image.fromarray((d * 255).astype(np.uint8)).save(
                os.path.join(out_dir, "depth", f"{i:05d}.png"))


def write_mesh_ply(path: str, verts: np.ndarray, faces: np.ndarray,
                   colors: Optional[np.ndarray] = None):
    """Binary-LE PLY with a face list element (beyond dataio.ply's columns).
    colors: optional [V,3] float in [0,1], written as uchar rgb (the
    open3d-compatible vertex_colors layout the reference exports)."""
    with_c = colors is not None and len(colors) == len(verts)
    with open(path, "wb") as f:
        header = [
            "ply", "format binary_little_endian 1.0",
            f"element vertex {len(verts)}",
            "property float x", "property float y", "property float z"]
        if with_c:
            header += ["property uchar red", "property uchar green",
                       "property uchar blue"]
        header += [
            f"element face {len(faces)}",
            "property list uchar int vertex_indices", "end_header", ""]
        f.write("\n".join(header).encode())
        if with_c:
            rec = np.empty(len(verts),
                           dtype=[("xyz", "<f4", (3,)), ("rgb", "u1", (3,))])
            rec["xyz"] = verts
            rec["rgb"] = np.clip(np.asarray(colors) * 255.0, 0,
                                 255).astype(np.uint8)
            f.write(rec.tobytes())
        else:
            f.write(verts.astype("<f4").tobytes())
        rec = np.empty(len(faces),
                       dtype=[("n", "u1"), ("v", "<i4", (3,))])
        rec["n"] = 3
        rec["v"] = faces
        f.write(rec.tobytes())


def read_mesh_ply(path: str, with_colors: bool = False):
    """Read back a mesh written by write_mesh_ply."""
    with open(path, "rb") as f:
        nv = nf = 0
        has_c = False
        while True:
            line = f.readline().strip()
            if line.startswith(b"element vertex"):
                nv = int(line.split()[-1])
            elif line.startswith(b"property uchar red"):
                has_c = True
            elif line.startswith(b"element face"):
                nf = int(line.split()[-1])
            elif line == b"end_header":
                break
        if has_c:
            rec = np.frombuffer(f.read(15 * nv),
                                dtype=[("xyz", "<f4", (3,)),
                                       ("rgb", "u1", (3,))])
            verts = rec["xyz"]
            colors = rec["rgb"].astype(np.float64) / 255.0
        else:
            verts = np.frombuffer(f.read(12 * nv),
                                  dtype="<f4").reshape(nv, 3)
            colors = None
        rec = np.frombuffer(f.read(13 * nf),
                            dtype=[("n", "u1"), ("v", "<i4", (3,))])
        if with_colors:
            return verts.astype(np.float64), rec["v"].astype(np.int64), \
                colors
        return verts.astype(np.float64), rec["v"].astype(np.int64)
