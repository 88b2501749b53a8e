"""gaot3d_tpu: a TPU-native (JAX/XLA/Pallas) Geometry-Aware Operator Transformer framework.

Re-implements the full capability surface of GAOT-3D (encode-process-decode neural
operator for steady-state PDEs on 500K-10M-node 3D meshes) with a TPU-first design:

- static-shape stencil-window graph building on the regular latent grid
  (replaces torch-cluster knn/radius; see ``gaot3d_tpu.ops.grid_graph``),
- masked segment/gather reductions (replaces torch-scatter; ``gaot3d_tpu.ops.segment``),
- fused attention processor over patched latent tokens,
- pjit/shard_map data- and node-parallel training over a device mesh
  (replaces NCCL/DDP; ``gaot3d_tpu.parallel``).

Reference behavior surveyed from Shizheng-Wen/GAOT-3D; file:line citations in
docstrings point at the reference implementation whose behavior each component
matches (architecture here is new, TPU-native).
"""

__version__ = "0.1.0"
