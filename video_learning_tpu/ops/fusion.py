"""Temporal / multi-input fusion ops.

Counterpart of /root/reference/tf_util.py and fusion aspects of
models/model.py: temporal fusion over the frames-per-clip axis
(tf_util.py:4-30), clip aggregation reshape (tf_util.py:126-133),
multi-tensor input fusion avg/max/concat/ibias (tf_util.py:136-179),
auxiliary-tensor replication by cpv ratio (tf_util.py:182-192), and
sequence(x)vector tiled concat (tf_util.py:99-124).

Everything is shape-static and jit-traceable: batch items are laid out with
frames flattened into the leading axis ((N*fpc, D), reference SURVEY §3.4)
and reshaped to (N, fpc, D) only at fusion boundaries, which XLA fuses into
the surrounding matmuls.
"""

import jax.numpy as jnp

from video_learning_tpu.defs import defs
from video_learning_tpu.utils import error, info


def apply_temporal_fusion(x, vector_dim, temporal_dim, fusion_method):
    """Fuse (N, T, D) over T (reference tf_util.py:4-30)."""
    if fusion_method == defs.fusion_method.last:
        return x[:, temporal_dim - 1, :]
    if fusion_method == defs.fusion_method.avg:
        return jnp.mean(x, axis=1)
    if fusion_method == defs.fusion_method.reshape:
        return jnp.reshape(x, (-1, vector_dim))
    error("Undefined frame fusion method: %s" % str(fusion_method))


def aggregate_clip_vectors(frames, dim, fpc, fusion_method):
    """(N*fpc, D) -> fuse over fpc (reference tf_util.py:126-133)."""
    return apply_temporal_fusion(frames.reshape(-1, fpc, dim), dim, fpc,
                                 fusion_method)


def replicate_auxiliary_tensor(aux, dim_aux, cpv_main, cpv_aux):
    """Tile the aux tensor so each aux item lines up with the main
    pipeline's clips (reference tf_util.py:182-192): repeats the whole aux
    block cpv_main/cpv_aux times along the batch axis."""
    tile_num = int(cpv_main / cpv_aux)
    if tile_num > 1:
        aux = jnp.reshape(aux, (1, -1))
        aux = jnp.tile(aux, (tile_num, 1))
        aux = jnp.reshape(aux, (-1, dim_aux))
    return aux


def vec_seq_concat(seq, vec, sequence_length, order="vecfirst"):
    """Concat each item's vector onto each of its sequence elements
    (reference tf_util.py:99-124).  seq: (N*T, Ds); vec: (N, Dv)."""
    vec_dim = vec.shape[-1]
    vec = jnp.tile(vec, (1, sequence_length)).reshape(-1, vec_dim)
    if order == "vecfirst":
        return jnp.concatenate([vec, seq], axis=1)
    return jnp.concatenate([seq, vec], axis=1)


def apply_tensor_list_fusion(inputs, fusion_method, dims, fpcs, cpvs):
    """Fuse a list of pipeline input tensors into one
    (reference tf_util.py:136-179).  Returns (tensor, dim, fpc, cpv)."""
    cpv_ratio = int(cpvs[0] / cpvs[1]) if len(inputs) == 2 else None

    if fusion_method == defs.fusion_method.avg:
        return (jnp.mean(jnp.stack(inputs), axis=0), dims[0], fpcs[0],
                cpvs[0])
    if fusion_method == defs.fusion_method.maximum:
        return (jnp.max(jnp.stack(inputs), axis=0), dims[0], fpcs[0],
                cpvs[0])
    if fusion_method == defs.fusion_method.concat:
        if cpv_ratio == 1 or (cpv_ratio is None and len(set(cpvs)) == 1
                              and len(set(fpcs)) == 1):
            # plain column concat: 2 inputs at equal cpv (reference
            # tf_util.py:148-149) or the N-way generalization when every
            # input shares the geometry
            return (jnp.concatenate(inputs, axis=1), sum(dims), fpcs[0],
                    cpvs[0])
        if cpv_ratio is None:
            # the reference's aux path silently used inputs[:2] here,
            # dropping the rest while reporting sum(dims) — fail loudly
            error("concat input fusion with %d inputs requires equal "
                  "cpv/fpc across inputs (got cpvs=%s fpcs=%s); tiled "
                  "main(x)aux concat is 2-input only"
                  % (len(inputs), cpvs, fpcs))
        aux = replicate_auxiliary_tensor(inputs[1], dims[1], cpvs[0], cpvs[1])
        return (vec_seq_concat(inputs[0], aux, fpcs[0]), sum(dims), fpcs[0],
                cpvs[0])
    if fusion_method == defs.fusion_method.ibias:
        main, aux = inputs
        if cpv_ratio != 1:
            aux = replicate_auxiliary_tensor(aux, dims[1], cpvs[0], cpvs[1])
        mdim, adim = dims
        mfpc = fpcs[0]
        # prepend the aux vector as an extra first timestep
        # (tf_util.py:153-176)
        main = main.reshape(-1, mfpc, mdim)
        aux = aux.reshape(-1, 1, adim)
        combo = jnp.concatenate([aux, main], axis=1)
        combo_fpc = mfpc + 1
        info("Input bias augmented fpc: %d + 1 = %d" % (mfpc, combo_fpc))
        return combo.reshape(-1, mdim), mdim, combo_fpc, cpvs[0]
    error("Unknown input fusion method: [%s]" % fusion_method)
