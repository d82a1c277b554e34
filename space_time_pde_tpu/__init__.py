"""space_time_pde_tpu — a TPU-native rebuild of MeshfreeFlowNet.

A JAX / XLA / Pallas framework for physics-constrained continuous
space-time super-resolution of PDE fields (MeshfreeFlowNet, SC '20,
arXiv:2005.01463), re-designed TPU-first:

- the UNet3D spatiotemporal encoder is an XLA-compiled NDHWC conv stack
  (reference: ``src/unet3d.py::UNet3d``),
- the local-implicit-grid query path (multilinear latent gather +
  ImNet MLP per continuous space-time point) has a fused Pallas kernel
  (reference: ``src/local_implicit_grid.py::query_local_implicit_grid``),
- the symbolic PDE residual layer compiles sympy ``dif``-DSL equations
  to forward-mode ``jax.jvp`` derivative graphs instead of torch
  ``autograd.grad(create_graph=True)`` tree-walking
  (reference: ``src/pde.py::PDELayer``),
- scale-out is ``jax.shard_map`` over device meshes with XLA
  collectives (``psum`` gradient sync, ``ppermute`` latent-halo
  exchange) instead of ``torch.nn.DataParallel``.

Layout:
  ops/       numerical core (grid interpolation, fused Pallas query)
  models/    ImNet decoder, UNet3D encoder, local implicit grid query
  physics/   sympy PDE DSL -> JAX residual graphs; RB2D equations
  data/      RB2D dataset pipeline + numpy Boussinesq data generator
  train/     jitted train/eval steps, optax, orbax checkpointing
  parallel/  meshes, data-parallel step, sharded-grid halo exchange
  utils/     config, logging, timing
"""

__version__ = "0.1.0"
