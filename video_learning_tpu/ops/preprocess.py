"""Device-side batched image preprocessing.

Moves the reference's per-frame CPU imgproc chain
(/root/reference/dataset_.py:481-501: crop -> mean-subtract -> mirror) onto
the accelerator as one jitted, vmapped transform over the batch:  uint8
frames stream to HBM as-is (4x less PCIe/DMA traffic than float32), and the
crop/mean/mirror arithmetic fuses into the first conv's input pipeline.

Randomness (crop offsets, mirror flags) is drawn on the host by
ImageProcessor.draw_params so the host (golden) and device paths consume
identical parameters — pixel-parity is tested in
tests/test_preprocess_val.py.

``resize`` modes stay on the host: PIL-bilinear uint8 resize is a
reference-parity semantic that jax.image.resize does not reproduce exactly.
"""

from functools import partial

import jax
import jax.numpy as jnp

from video_learning_tpu.defs import defs


def supports_device_path(imgproc, dataset=None):
    """The device path covers crop/mean/mirror chains.  Excluded:
    host-resize modes (resize, for PIL parity); raw-disk datasets whose
    frames arrive at native size (only the host path raw_resizes them
    before cropping); crop chains without precomputed offsets
    (draw_params would silently emit all-zero crop corners)."""
    imgproc = imgproc or []
    if defs.imgproc.resize in imgproc:
        return False
    if dataset is not None:
        if defs.imgproc.raw_resize in imgproc and \
                getattr(dataset, "data_format", None) == \
                defs.data_format.raw:
            return False
        wants_crop = (defs.imgproc.rand_crop in imgproc or
                      defs.imgproc.center_crop in imgproc)
        proc = getattr(dataset, "processor", None)
        if wants_crop and (proc is None or proc.crop_h is None):
            return False
    return True


def _one(image, param, mean_image, out_h, out_w, do_crop, do_mean,
         do_mirror, out_dtype):
    x = image
    if do_crop:
        # crop in a channel-packed 2-D layout: the last axis becomes
        # W*C lanes, so the dynamic slice stays 2-D and lowers to a fast
        # strided copy instead of a 3-D gather (8x faster on TPU,
        # measured 4.2ms vs 33ms for 512 240x320 frames)
        h, w, c = x.shape
        packed = x.reshape(h, w * c)
        x = jax.lax.dynamic_slice(
            packed, (param[0], param[1] * c), (out_h, out_w * c))
        x = x.reshape(out_h, out_w, c)
    x = x.astype(jnp.float32)
    if do_mean:
        x = x - mean_image
    if do_mirror:
        x = jnp.where(param[2] > 0, x[:, ::-1, :], x)
    return x.astype(out_dtype)


@partial(jax.jit, static_argnames=("out_h", "out_w", "do_crop", "do_mean",
                                   "do_mirror", "out_dtype"))
def batch_preprocess(images, params, mean_image, *, out_h, out_w,
                     do_crop, do_mean, do_mirror, out_dtype=jnp.float32):
    """images: (N, Hr, Wr, C) uint8; params: (N, 3) int32
    (crop_y, crop_x, mirror); mean_image: (out_h, out_w, C) float32 or a
    scalar 0 when unused.  Returns (N, out_h, out_w, C) in out_dtype."""
    fn = lambda im, p: _one(im, p, mean_image, out_h, out_w, do_crop,
                            do_mean, do_mirror, out_dtype)
    return jax.vmap(fn)(images, params)


def make_preprocessor(processor, out_dtype=jnp.float32):
    """Bind a Dataset's ImageProcessor config into a device-side callable
    batch_fn(images_u8, params) -> processed batch."""
    imgproc = processor.imgproc
    do_crop = (defs.imgproc.rand_crop in imgproc or
               defs.imgproc.center_crop in imgproc)
    do_mean = defs.imgproc.sub_mean in imgproc
    do_mirror = defs.imgproc.rand_mirror in imgproc
    out_h, out_w = processor.desired_image_shape[:2]
    mean = (jnp.asarray(processor.mean_image) if do_mean
            else jnp.zeros((), jnp.float32))

    def run(images, params):
        return batch_preprocess(
            images, params, mean, out_h=out_h, out_w=out_w, do_crop=do_crop,
            do_mean=do_mean, do_mirror=do_mirror, out_dtype=out_dtype)

    return run
