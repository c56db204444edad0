"""Device-mesh sharding of the MPC pair grid.

The reference's only parallel axis is OpenMP over the O(N^2) pair grid
(reference: src/mpcflat.cpp:243, src/consflat.cpp:11). The TPU-native
equivalent (SURVEY §5 "Distributed communication backend"): a 1-D
`jax.sharding.Mesh` whose 'dp' axis shards

  * the pair batch of the Forward/Backward/posterior kernels (pure data
    parallel — zero collectives in the hot loop), and
  * the block-row axis of the consistency matmul (each device computes
    M[rows] @ M; XLA inserts the all-gather of M's columns over ICI).

EA distance blocks are gathered to host for the (serial, tiny) UPGMA
stage. Trees/join order stay replicated on host.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import pairhmm


def make_mesh(devices=None, axis: str = "dp") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def batch_spec(mesh: Mesh) -> P:
    """PartitionSpec sharding a leading batch axis over EVERY mesh axis
    (works for both the 1-D 'dp' mesh and the 2-D (dcn, ici) mesh: the
    batch is pure data parallel, so hosts and chips are one flat
    parallel axis; XLA still decomposes any collective hierarchically
    — ICI within a host, DCN across)."""
    return P(tuple(mesh.axis_names))


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Multi-host bring-up (DCN): call once per host before any device
    op. Reads JAX_COORDINATOR_ADDRESS etc. when args are None. No-op on
    a single host. The reference has no distributed mode at all
    (SURVEY §5: one process + OpenMP); this is the TPU-native scale-out
    path (jax.distributed + a 2-D dcn x ici mesh, collectives ride ICI
    within a host and DCN across)."""
    import os
    coord = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not coord:
        return
    jax.distributed.initialize(
        coordinator_address=coord,
        num_processes=(num_processes if num_processes is not None
                       else int(os.environ.get("JAX_NUM_PROCESSES", 1))),
        process_id=(process_id if process_id is not None
                    else int(os.environ.get("JAX_PROCESS_ID", 0))))


def make_mesh_2d(devices=None) -> Mesh:
    """2-D (dcn, ici) mesh: the outer axis spans hosts (DCN), the inner
    axis the chips within a host (ICI). The pair grid shards over BOTH
    axes (pure data parallel, so the only cross-host traffic is the
    replicated-operand all-gather of the blocked consistency, which XLA
    hierarchically decomposes: ICI all-gather within hosts, DCN
    between). On one host this degenerates to (1, n_devices)."""
    devices = devices if devices is not None else jax.devices()
    n_hosts = max(1, len({d.process_index for d in devices}))
    per_host = len(devices) // n_hosts
    grid = np.asarray(devices).reshape(n_hosts, per_host)
    return Mesh(grid, ("dcn", "ici"))


def global_array(mesh: Mesh, np_value, spec=None):
    """Build a global jax.Array from a host value every process holds in
    full (the normal state here: inputs are replicated host-side).
    Shards are sliced locally — no cross-host transfer. Required on a
    multi-process (DCN) mesh, where jit refuses raw numpy inputs with
    non-trivial shardings; on a single process it degenerates to a
    plain device put with that sharding."""
    spec = spec if spec is not None else batch_spec(mesh)
    sh = NamedSharding(mesh, spec)
    np_value = np.asarray(np_value)
    return jax.make_array_from_callback(np_value.shape, sh,
                                        lambda idx: np_value[idx])


def sharded_batch_posteriors(mesh: Mesh, pack, with_mea: bool = True,
                             backend: str = "scan",
                             replicate_out: bool = False):
    """Returns fn(xb, yb, lxb, lyb) -> (post, ea) with the pair axis
    sharded over every mesh axis. Batch size must be a multiple of the
    mesh size. replicate_out=True makes the outputs fully replicated —
    required when the caller must read them on every process of a
    multi-host (DCN) mesh (a dcn-sharded output is not addressable
    outside its home process)."""
    args = pairhmm.score_args(pack)
    data_sharding = NamedSharding(mesh, batch_spec(mesh))
    out_sharding = (NamedSharding(mesh, P()) if replicate_out
                    else data_sharding)

    if backend == "pallas":
        from ..ops.pairhmm_pallas import batch_posteriors_pallas as kernel
    else:
        kernel = pairhmm.batch_posteriors

    @partial(jax.jit,
             in_shardings=(data_sharding, data_sharding,
                           data_sharding, data_sharding),
             out_shardings=(out_sharding, out_sharding))
    def fn(xb, yb, lxb, lyb):
        return kernel(xb, yb, lxb, lyb, *args, with_mea=with_mea)

    return fn


# (sharded_consistency — a wrapper over the legacy dense consistency
# iteration — was removed in round 4: production consistency is the
# blocked sparse path, which takes `mesh=` directly in
# ops.consistency.consistency_sparse and is dryrun-proven there.)
