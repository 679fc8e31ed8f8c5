"""arctic_tpu — a TPU-native forward PBR render engine.

A from-scratch re-design of the capabilities of the Arctic DX12 renderer
(reference: novara754/arctic-renderer) for TPU hardware:

- Geometry, lights and camera live as HBM-resident ``jax.Array`` pytrees
  (replacing D3D12 buffers/descriptor heaps, reference src/renderer/rhi.cpp).
- The whole frame — shadow-map depth pass, forward Cook-Torrance PBR with
  25-tap PCF shadows, equirectangular skybox, HDR tonemap + gamma — is one
  jit-compiled function with no host round-trips (replacing the command-list
  frame graph in reference src/renderer/renderer.cpp:274-415).
- Rasterization is reformulated for the MXU/VPU: triangle setup produces
  screen-space edge/depth plane coefficients, tiles are binned via
  sort/searchsorted, and a Pallas per-tile kernel evaluates edge functions
  as matmuls with a masked min-reduce depth test (no ROPs, no atomics).
- Shading is deferred from a visibility buffer, so the expensive PBR math
  runs exactly once per covered pixel as fused XLA elementwise code.

Layout:
    core/      math + scene/settings data model (reference scene.{hpp,cpp})
    io/        glTF / OBJ / PNG / Radiance-HDR loaders (reference app.cpp:173-385)
    ops/       rasterizer, binning, sampling, PBR, shadow, tonemap kernels
    models/    render pipelines (frame graph) + golden CPU reference renderer
    parallel/  multi-chip tile sharding over a jax.sharding.Mesh
    utils/     profiling, logging, framebuffer helpers
    app/       CLI, fly-camera controller, offline viewer
"""

__version__ = "0.1.0"
