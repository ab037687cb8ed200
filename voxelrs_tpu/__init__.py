"""voxelrs_tpu — a TPU-native sparse-voxel-octree raytracing engine.

A from-scratch rebuild of the capabilities of tim-oster/voxel-rs (Rust + GLSL)
as an idiomatic JAX/XLA/Pallas framework:

- ``world``     — chunks, octrees, ESVO serialization, GPU-buffer range allocation
                  (reference: src/world/*)
- ``systems``   — job scheduling, chunk streaming, world→SVO mapping, physics,
                  storage (reference: src/systems/*)
- ``graphics``  — the renderer front-end: HBM SVO buffer, materials, textures,
                  render/raycast entry points (reference: src/graphics/*)
- ``ops``       — the device kernels: batched ESVO traversal, shading,
                  texture sampling (reference: assets/shaders/*)
- ``gamelogic`` — game loop, worldgen, content, benchmark collection
                  (reference: src/gamelogic/*)
- ``parallel``  — multi-chip sharding of the pixel grid over a jax Mesh
- ``models``    — the "flagship model": the fused frame pipeline
                  (trace + shade + physics as one XLA program)
"""

__version__ = "0.1.0"
