"""Host-side image IO + preprocessing with reference-parity semantics.

Mirrors the reference's CPU image chain (/root/reference/dataset_.py:444-530
and serialize.py:411-434): PIL-bilinear uint8 resize (the semantics of the
deprecated ``scipy.misc.imresize``), grayscale->3ch expansion, alpha drop,
RGB->BGR channel order, center/random crop with the reference's precomputed
crop grids, 3-scalar mean-image subtraction (BGR order), and random
horizontal mirroring.

The hot training path runs these on-device (see ops/preprocess.py); this
module is the golden-semantics host implementation used by the offline
packer, the eval tools, and the parity tests.
"""

import numpy as np
from PIL import Image

from video_learning_tpu.defs import defs
from video_learning_tpu.utils import error


def imresize(image, shape):
    """uint8 bilinear resize via PIL, matching scipy.misc.imresize
    (used at serialize.py:426 and dataset_.py:484-491).  ``shape`` is
    (H, W) or (H, W, C)."""
    h, w = int(shape[0]), int(shape[1])
    arr = np.asarray(image)
    if arr.dtype != np.uint8:
        arr = arr.astype(np.uint8)
    mode = "RGB" if arr.ndim == 3 else "L"
    pil = Image.fromarray(arr, mode=mode)
    pil = pil.resize((w, h), resample=Image.BILINEAR)
    return np.asarray(pil)


def read_image(imagepath, raw_image_shape=None):
    """Read an image from disk: grayscale->3ch, drop non-RGB channels,
    RGB->BGR, optional resize to the raw shape (serialize.py:411-434)."""
    image = np.asarray(Image.open(imagepath))
    if image.ndim <= 2:
        image = np.repeat(image[:, :, np.newaxis], 3, 2)
    image = image[:, :, :3]
    image = image[:, :, ::-1]  # BGR, caffe-style (serialize.py:422)
    if raw_image_shape is not None:
        image = imresize(image, raw_image_shape)
    return image


def compute_crop(raw_image_shape, image_shape, mode):
    """Precompute crop offset candidates (dataset_.py:571-577).
    center_crop -> (h_off, w_off) scalars; rand_crop -> candidate lists."""
    if mode == defs.imgproc.center_crop:
        return tuple(int(np.floor((r - d) / 2))
                     for r, d in zip(raw_image_shape[:2], image_shape[:2]))
    if mode == defs.imgproc.rand_crop:
        # full valid offset range 0..raw-desired inclusive (the reference
        # excludes the last two offsets and crashes when raw-desired <= 1,
        # dataset_.py:571-577; intentionally fixed here)
        if raw_image_shape[0] < image_shape[0] or \
                raw_image_shape[1] < image_shape[1]:
            error("Crop target %s exceeds raw shape %s"
                  % (tuple(image_shape[:2]), tuple(raw_image_shape[:2])))
        crop_h = list(range(0, raw_image_shape[0] - image_shape[0] + 1))
        crop_w = list(range(0, raw_image_shape[1] - image_shape[1] + 1))
        return crop_h, crop_w
    error("Unknown crop mode %s" % mode)


def build_mean_image(mean_scalars, image_shape):
    """Expand a 3-scalar per-channel mean into an HxWx3 float32 image in
    BGR channel order (dataset_.py:521-530)."""
    h, w = int(image_shape[0]), int(image_shape[1])
    planes = [np.full((h, w), float(m)) for m in mean_scalars]
    return np.transpose(np.stack(planes), [1, 2, 0]).astype(np.float32)


class ImageProcessor:
    """Stateful per-dataset image processing chain (dataset_.py:481-501).

    ``process(image, rng)`` applies, in reference order:
      raw_resize -> {rand_crop | center_crop | resize} -> shape check
      -> sub_mean -> rand_mirror.
    ``rng`` is a ``random.Random``; crop offsets / mirror decisions can also
    be precomputed in bulk via ``draw_params`` for the device-side path.
    """

    def __init__(self, imgproc, raw_image_shape, desired_image_shape,
                 mean_scalars):
        self.imgproc = list(imgproc or [])
        self.raw_image_shape = raw_image_shape
        self.desired_image_shape = desired_image_shape
        self.mean_image = None
        if defs.imgproc.sub_mean in self.imgproc:
            if mean_scalars is None:
                error("sub_mean requires a mean image intensity triple")
            self.mean_image = build_mean_image(mean_scalars,
                                               desired_image_shape)
        self.crop_h = self.crop_w = None
        if defs.imgproc.rand_crop in self.imgproc and raw_image_shape:
            self.crop_h, self.crop_w = compute_crop(
                raw_image_shape, desired_image_shape, defs.imgproc.rand_crop)
        elif defs.imgproc.center_crop in self.imgproc and raw_image_shape:
            self.crop_h, self.crop_w = compute_crop(
                raw_image_shape, desired_image_shape, defs.imgproc.center_crop)

    # -------------------------------------------------------------- params
    def draw_params(self, n, rng):
        """Draw n (crop_y, crop_x, mirror) parameter triples up-front; used
        both by process() and by the batched on-device preprocessor so the
        two paths consume identical randomness."""
        params = np.zeros((n, 3), dtype=np.int32)
        rand_crop = defs.imgproc.rand_crop in self.imgproc
        center_crop = defs.imgproc.center_crop in self.imgproc
        if (rand_crop or center_crop) and self.crop_h is None:
            # fail at the mechanism, not at distant call-site guards:
            # zero-filled corners would silently crop every frame top-left
            error("draw_params needs precomputed crop offsets "
                  "(raw_image_shape unset?)")
        rand_mirror = defs.imgproc.rand_mirror in self.imgproc
        # one python-RNG draw seeds a vectorized numpy stream for the
        # whole batch (the per-image python loop measured 85 ms of the
        # 770 ms bench epoch on the 1-core host); host and device paths
        # both consume THIS function (process() routes through it), so
        # they see identical parameters from a shared rng by construction.
        # Fully deterministic configs (center_crop, no mirror) consume no
        # randomness at all.
        rs = (np.random.RandomState(rng.getrandbits(32))
              if (rand_crop or rand_mirror) else None)
        if rand_crop:
            params[:, 0] = rs.choice(np.asarray(self.crop_h), n)
            params[:, 1] = rs.choice(np.asarray(self.crop_w), n)
        elif center_crop:
            params[:, 0] = self.crop_h
            params[:, 1] = self.crop_w
        if rand_mirror:
            # reference semantics: mirror on a fair coin
            # (dataset_.py:497 randrange(2) == 0)
            params[:, 2] = rs.randint(0, 2, n)
        return params

    # ------------------------------------------------------------- process
    def _crop(self, image, mode, rng):
        if self.crop_h is None:
            ch, cw = compute_crop(image.shape, self.desired_image_shape, mode)
        else:
            ch, cw = self.crop_h, self.crop_w
        if mode == defs.imgproc.rand_crop:
            ch, cw = rng.choice(ch), rng.choice(cw)
        ch, cw = int(ch), int(cw)
        return image[ch:ch + self.desired_image_shape[0],
                     cw:cw + self.desired_image_shape[1], :]

    def supports_params(self):
        """True when augmentation parameters can be pre-drawn for a whole
        batch (crop offsets are global, not per-image-shape)."""
        needs_crop = (defs.imgproc.rand_crop in self.imgproc or
                      defs.imgproc.center_crop in self.imgproc)
        return not needs_crop or self.crop_h is not None

    def process_batch(self, images, rng):
        """Host-path batch processing that consumes rng EXACTLY like the
        device path does (one draw_params call per batch), so the two
        paths produce identical pixels from a shared rng."""
        if not self.supports_params():
            return [self.process(im, rng) for im in images]
        params = self.draw_params(len(images), rng)
        out = []
        for im, p in zip(images, params):
            im = self.process_with_params(im, int(p[0]), int(p[1]),
                                          int(p[2]))
            if self.desired_image_shape is not None and \
                    tuple(im.shape) != tuple(self.desired_image_shape):
                error("Encountered image shape %s but desired shape is %s"
                      % (im.shape, self.desired_image_shape))
            out.append(im)
        return out

    def process(self, image, rng):
        needs_crop = (defs.imgproc.rand_crop in self.imgproc or
                      defs.imgproc.center_crop in self.imgproc)
        if not needs_crop or self.crop_h is not None:
            # the host path consumes the SAME parameter source as the
            # batched device preprocessor, so the two can never diverge
            p = self.draw_params(1, rng)[0]
            image = self.process_with_params(image, int(p[0]), int(p[1]),
                                             int(p[2]))
            if self.desired_image_shape is not None and \
                    tuple(image.shape) != tuple(self.desired_image_shape):
                error("Encountered image shape %s but desired shape is %s"
                      % (image.shape, self.desired_image_shape))
            return image
        # per-image crop geometry (raw_image_shape unset: offsets depend
        # on each image's own shape, which draw_params cannot precompute)
        if defs.imgproc.raw_resize in self.imgproc:
            image = imresize(image, self.raw_image_shape)
        if defs.imgproc.rand_crop in self.imgproc:
            image = self._crop(image, defs.imgproc.rand_crop, rng)
        elif defs.imgproc.center_crop in self.imgproc:
            image = self._crop(image, defs.imgproc.center_crop, rng)
        elif defs.imgproc.resize in self.imgproc:
            image = imresize(image, self.desired_image_shape)
        if self.desired_image_shape is not None and \
                tuple(image.shape) != tuple(self.desired_image_shape):
            error("Encountered image shape %s but desired shape is %s"
                  % (image.shape, self.desired_image_shape))
        if defs.imgproc.sub_mean in self.imgproc:
            image = image - self.mean_image
        if defs.imgproc.rand_mirror in self.imgproc:
            if not rng.randrange(2):
                image = image[:, ::-1, :]
        return image

    def process_with_params(self, image, crop_y, crop_x, mirror):
        """Deterministic variant taking pre-drawn parameters (golden path
        for testing the on-device batched preprocessor)."""
        if defs.imgproc.raw_resize in self.imgproc:
            image = imresize(image, self.raw_image_shape)
        if defs.imgproc.rand_crop in self.imgproc or \
                defs.imgproc.center_crop in self.imgproc:
            image = image[crop_y:crop_y + self.desired_image_shape[0],
                          crop_x:crop_x + self.desired_image_shape[1], :]
        elif defs.imgproc.resize in self.imgproc:
            image = imresize(image, self.desired_image_shape)
        if defs.imgproc.sub_mean in self.imgproc:
            image = image - self.mean_image
        if defs.imgproc.rand_mirror in self.imgproc and mirror:
            image = image[:, ::-1, :]
        return image
