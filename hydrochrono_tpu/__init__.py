"""hydrochrono_tpu — a TPU-native time-domain wave-energy-converter simulator.

A ground-up JAX/XLA/Pallas re-design of the capabilities of HydroChrono
(Project-SEA-Stack/HydroChrono): BEMIO hydrodynamic coefficients drive a
Cummins-equation time-domain simulation of floating multibody systems —
hydrostatic restoring, radiation-damping convolution over a velocity-history
ring buffer, wave-excitation forces (regular and irregular seas), constrained
rigid-body dynamics with joints and PTO spring-dampers — all compiled into a
single `jax.lax.scan` stepper that batches thousands of simulation instances
via `vmap` and shards them over a TPU mesh via `shard_map`.

Layer map (bottom → top), mirroring SURVEY.md §1:
  io/        BEMIO HDF5 loader, results-HDF5 writer (schema v0.3), eta import
  physics/   hydrostatics, radiation kernels, wave models, rigid-body math,
             joints/TSDA/RSDA constraint assembly
  ops/       fused TPU ops (blocked convolutions, batched KKT solves, Pallas)
  stepper    the lax.scan time integrator (semi-implicit / HHT)
  scene/     YAML surface (*.setup/*.model/*.simulation/*.hydro.yaml)
  parallel/  device-mesh sharding of the batch axis
  utils/     logging, progress, profiling, NaN guards
  cli        `run_hydrochrono`-compatible command line
"""

__version__ = "0.3.0"

from hydrochrono_tpu.io.bemio import HydroData, load_bemio_h5  # noqa: F401
