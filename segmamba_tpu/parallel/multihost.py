"""Multi-host data parallelism helpers.

The reference is explicitly single-node (launch.py:78-80 exits for
num_nodes != 1). On TPU pods, multi-host DP is the same single program: call
``initialize_multihost()`` once per process, build the global mesh over all
devices, and feed each host its local batch shard — XLA runs the gradient
all-reduce over ICI/DCN.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_multihost(coordinator_address=None, num_processes=None,
                         process_id=None):
    """jax.distributed bootstrap. On TPU pods with standard env vars all
    arguments auto-detect; a no-op when already initialized or single-host."""
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError:
        pass  # already initialized
    return jax.process_index(), jax.process_count()


def global_data_mesh():
    """1-D data mesh over every device in the job (all hosts)."""
    return Mesh(np.asarray(jax.devices()), ("data",))


def make_global_batch(local_batch, mesh):
    """Assemble a globally-sharded batch from each host's local shard.

    ``local_batch`` leaves are (local_B, ...) numpy arrays; the result is a
    global array of shape (local_B * num_hosts, ...) sharded over 'data'
    without any cross-host copy (jax.make_array_from_process_local_data).
    """
    sharding = NamedSharding(mesh, P("data"))

    def place(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree_util.tree_map(place, local_batch)


def is_main_process():
    return jax.process_index() == 0
