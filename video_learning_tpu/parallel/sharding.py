"""Parameter sharding rules: tensor parallelism over the ``model`` axis.

Large 2-D kernels (AlexNet fc6/fc7/fc8: 9216x4096 etc., LSTM fused
kernels: (D+H, 4H)) are sharded column-wise over the model axis; XLA GSPMD
turns the following row-wise consumer into a reduce-scatter/all-gather pair
on ICI.  Everything else (conv kernels, biases, small FCs) is replicated —
their communication cost would exceed their memory savings.
"""

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from video_learning_tpu.parallel.mesh import MODEL_AXIS


def _spec_for_leaf(path, leaf, model_size):
    if model_size <= 1:
        return P()
    shape = getattr(leaf, "shape", ())
    if len(shape) == 2 and shape[1] % model_size == 0 and \
            shape[0] * shape[1] >= 1 << 16:
        return P(None, MODEL_AXIS)  # column-parallel kernel
    if len(shape) == 1 and shape[0] % model_size == 0 and \
            shape[0] >= 4096:
        return P(MODEL_AXIS)        # matching wide bias
    return P()


def param_shardings(params, mesh):
    """NamedSharding pytree for a parameter tree under ``mesh``."""
    model_size = mesh.shape.get(MODEL_AXIS, 1)

    def assign(path, leaf):
        return NamedSharding(mesh, _spec_for_leaf(path, leaf, model_size))

    return jax.tree_util.tree_map_with_path(assign, params)


def shard_params(params, mesh):
    """Place a parameter tree onto the mesh according to the rules."""
    shardings = param_shardings(params, mesh)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
