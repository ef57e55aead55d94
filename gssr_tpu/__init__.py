"""gssr_tpu — a TPU-native Gaussian-splatting surface-reconstruction framework.

A from-scratch JAX/Pallas/pjit re-design of the capabilities of GS-SR
(reference: /root/reference): 3DGS / Scaffold-GS / Octree-GS representations,
2DGS / PGSR surface reconstruction, VastGaussian scene partitioning, TSDF
mesh extraction — built TPU-first:

* functional core: gaussian state is a fixed-capacity pytree (static shapes
  for XLA), densification is masked compaction instead of tensor surgery;
* one rasterizer skeleton (project -> bin -> sort -> blend) with payload
  variants (vanilla conic / 2DGS ray-splat / PGSR planar), the blend stage a
  Pallas kernel pair (fwd + analytic bwd) under jax.custom_vjp;
* multi-chip scaling via jax.sharding.Mesh + shard_map (camera-batch data
  parallel + pixel sharding), gradients psum'd over ICI.
"""

__version__ = "0.1.0"

# Persist compiled executables across processes: TPU kernel compiles go
# through a remote service here and can take minutes; the cache makes each
# (shape, kernel) combination compile once per machine.
import os as _os

_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                       _os.path.expanduser("~/.cache/gssr_tpu_xla"))
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

# f32 matmuls everywhere by default. TPU's DEFAULT matmul precision is bf16;
# the splatting pipeline's XLA-level matmuls are GEOMETRY (camera projection,
# the 2DGS splat->pixel T matrix, MLP-decoded offsets/covariances), and bf16
# there was the root cause of the round-4 composed-backward corruption: every
# Pallas kernel pins Precision.HIGHEST, so isolated kernel A/B passed, but
# the composed compiled graph fed the kernels bf16-rounded projections.
# Pixel-scale rounding flips the blend's hard gates (alpha cut, rect
# coverage), decorrelating gradients catastrophically with scene size —
# octree-2dgs at 400x304 collapsed (PSNR 6.4) while CPU (always-f32) trained
# to 28+. With "highest", TPU gradients match CPU to cos >= 0.999998 on
# every leaf (benchmarks/fd_probe.py). Override via GSSR_MATMUL_PRECISION
# for experiments; the measured step cost is small (the rasterizer kernels
# dominate and were already f32).
from jax import config as _jax_config

_jax_config.update("jax_default_matmul_precision",
                   _os.environ.get("GSSR_MATMUL_PRECISION", "highest"))
