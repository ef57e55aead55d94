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
