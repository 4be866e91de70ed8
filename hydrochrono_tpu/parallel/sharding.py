"""Device-mesh sharding of the simulation batch axis.

The reference is a single-process CPU code whose only parallelism is one
OpenMP region over RIRF lags (SURVEY.md §2.5). The TPU-native scaling model
is different and simpler: simulation instances are independent, so the batch
axis B (wave seeds, period sweeps, PTO coefficients, farm layouts) is the
sharded axis. Each device owns B/n instances; no per-step collectives are
needed — XLA inserts nothing but the final gather when the host fetches
results. Cross-instance reductions (sweep statistics) ride ICI as psums.

All batched leaves (params + initial states) are placed with a
NamedSharding(P("batch")) so jit runs one SPMD program across the mesh.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def batch_mesh(devices=None, axis_name: str = "batch") -> Mesh:
    """A 1-D mesh over all (or the given) devices."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def shard_batch(tree, mesh: Mesh, axis_name: str = "batch"):
    """Place every leaf with a leading batch axis on the mesh, sharded on it."""
    sharding = NamedSharding(mesh, P(axis_name))

    def place(x):
        x = jnp.asarray(x)
        if x.ndim == 0:
            return x
        return jax.device_put(x, sharding)

    return jax.tree.map(place, tree)


def make_batched_states(sim, batch: int, pos_offsets: Optional[np.ndarray] = None):
    """Batched initial states; optionally perturb initial positions per instance."""
    base = sim.init_state()

    def tile(x):
        return jnp.broadcast_to(x[None], (batch,) + x.shape).copy()

    state = jax.tree.map(tile, base)
    if pos_offsets is not None:
        state.pos = state.pos + jnp.asarray(pos_offsets, base.pos.dtype)
    return state


def sharded_run(sim, num_steps: int, batched_state=None, batched_params: Optional[dict] = None,
                mesh: Optional[Mesh] = None, axis_name: str = "batch", batch: Optional[int] = None):
    """Run a batch of instances sharded across a device mesh.

    Returns (final_states, trajectory) with leading axis B, sharded on the mesh.
    """
    mesh = mesh or batch_mesh(axis_name=axis_name)
    if batched_state is None:
        if batch is None:
            raise ValueError("pass batched_state or batch")
        batched_state = make_batched_states(sim, batch)

    params = dict(sim.params)
    axes_params = {k: None for k in params}
    if batched_params:
        for k, v in batched_params.items():
            params[k] = v
            axes_params[k] = 0

    batched_state = shard_batch(batched_state, mesh, axis_name)
    if batched_params:
        params = {**params, **shard_batch({k: params[k] for k in batched_params}, mesh, axis_name)}

    def one(p, s):
        return sim.run(num_steps, state=s, params=p)

    fn = jax.jit(jax.vmap(one, in_axes=(axes_params, 0)))
    return fn(params, batched_state)
