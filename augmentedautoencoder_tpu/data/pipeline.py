"""Device-resident training data pipeline.

Replaces the reference's 10-thread tf.FIFOQueue producer pool
(auto_pose/ae/queue.py:27-74 + dataset.py:456-495) with a single pure,
jit-compilable `sample_batch(rng)`:

  gather random (x, mask, y) triplets -> optional square / realistic
  occlusion -> background substitution through the mask -> augmentation
  chain -> [0,1] float32

Everything runs on-device and fuses into the training step; the rendered
arrays live in HBM once (20k x 128x128x3 uint8 x 2 + masks + backgrounds
~= 2.5 GB — comfortably resident on one chip).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TrainConfig
from .augment import build_augmenter

Array = jax.Array


class DeviceData(NamedTuple):
    """The HBM-resident training arrays, shaped as a pytree so they pass
    through jit as ARGUMENTS (closing over them would bake gigabytes of
    captured constants into every compiled step executable)."""

    train_x: Array
    mask_x: Array
    train_y: Array
    bg_imgs: Array
    noof_obj_pixels: Array
    occlusion_masks: Optional[Array]

#: bounded retries for the occlusion visible-fraction guarantee loops (the
#: reference retries unboundedly, dataset.py:445-454; acceptance per try is
#: >90% so 8 tries bounds the failure probability below 1e-8)
_OCCLUSION_RETRIES = 8


def translate2d(img: Array, ty: Array, tx: Array) -> Array:
    """Shift a (H, W) image by integer (ty, tx), zero-filling (the device
    analogue of cv2.warpAffine translation, reference dataset.py:431-433)."""
    h, w = img.shape
    padded = jnp.zeros((3 * h, 3 * w), img.dtype).at[h : 2 * h, w : 2 * w].set(img)
    return jax.lax.dynamic_slice(padded, (h - ty, w - tx), (h, w))


def _square_occlusion_step(rng, obj_masks, p=0.4, size_percent=0.01, sometimes=0.7):
    """One trial of Sometimes(0.7, CoarseDropout(p=0.4, size_percent=0.01))
    on object masks (reference _aug_occl, dataset.py:392-402)."""
    b, h, w = obj_masks.shape
    gh = max(1, int(round(h * size_percent)))
    gw = max(1, int(round(w * size_percent)))
    k1, k2 = jax.random.split(rng)
    keep = jax.random.bernoulli(k1, 1.0 - p, (b, gh, gw))
    ridx = (jnp.arange(h) * gh // h).astype(jnp.int32)
    cidx = (jnp.arange(w) * gw // w).astype(jnp.int32)
    keep_full = keep[:, ridx][:, :, cidx]
    apply = jax.random.bernoulli(k2, sometimes, (b, 1, 1))
    return jnp.where(apply, obj_masks & keep_full, obj_masks)


def square_occlusion(rng: Array, masks: Array, noof_obj_pixels: Array, max_occl: float) -> Array:
    """Drop square patches from the object, guaranteeing >= (1 - max_occl)
    of the original object pixels stay visible (dataset.py:445-454).

    masks: (B,H,W) bool, True = background. Returns same convention.
    """
    obj0 = ~masks
    orig = jnp.maximum(noof_obj_pixels.astype(jnp.float32), 1.0)

    def body(i, carry):
        rng, result, done = carry
        rng, sub = jax.random.split(rng)
        cand = _square_occlusion_step(sub, obj0)
        visible = cand.sum(axis=(1, 2)).astype(jnp.float32) / orig
        ok = visible >= (1.0 - max_occl)
        take = ok & ~done
        result = jnp.where(take[:, None, None], cand, result)
        return rng, result, done | ok

    _, obj, _ = jax.lax.fori_loop(
        0, _OCCLUSION_RETRIES, body, (rng, obj0, jnp.zeros(masks.shape[0], bool))
    )
    return ~obj


def realistic_occlusion(
    rng: Array,
    masks: Array,
    occluders: Array,
    max_occl: float,
    min_occl: float = 0.0,
    min_trans: float = 0.2,
    max_trans: float = 0.7,
) -> Array:
    """Overlay random translated occluder silhouettes (reference
    augment_occlusion_mask, dataset.py:421-444).

    masks: (B,H,W) bool True=background; occluders: (K,H,W) bool.
    Occluded object pixels flip to background (xor semantics).
    """
    b, h, w = masks.shape
    obj = ~masks
    obj_count = jnp.maximum(obj.sum(axis=(1, 2)).astype(jnp.float32), 1.0)

    def body(i, carry):
        rng, result, done = carry
        rng, k1, k2, k3 = jax.random.split(rng, 4)
        pick = jax.random.randint(k1, (b,), 0, occluders.shape[0])
        occ = occluders[pick]
        sign = jax.random.rademacher(k2, (b, 2))
        mag = min_trans + (max_trans - min_trans) * jax.random.uniform(k3, (b, 2))
        tys = (sign[:, 0] * mag[:, 0] * h).astype(jnp.int32)
        txs = (sign[:, 1] * mag[:, 1] * w).astype(jnp.int32)
        occ_t = jax.vmap(translate2d)(occ, tys, txs)
        overlap = obj & occ_t
        frac = overlap.sum(axis=(1, 2)).astype(jnp.float32) / obj_count
        ok = (frac < max_occl) & (frac > min_occl)
        cand = obj & ~occ_t
        take = ok & ~done
        result = jnp.where(take[:, None, None], cand, result)
        return rng, result, done | ok

    _, obj_out, _ = jax.lax.fori_loop(
        0, _OCCLUSION_RETRIES, body, (rng, obj, jnp.zeros(b, bool))
    )
    return ~obj_out


class DeviceDataset:
    """Rendered arrays resident on device + the jitted batch sampler."""

    def __init__(
        self,
        cfg: TrainConfig,
        train_x: np.ndarray,
        mask_x: np.ndarray,
        train_y: np.ndarray,
        bg_imgs: np.ndarray,
        noof_obj_pixels: Optional[np.ndarray] = None,
        occlusion_masks: Optional[np.ndarray] = None,
    ):
        self.cfg = cfg
        if noof_obj_pixels is None:
            noof_obj_pixels = np.count_nonzero(np.asarray(mask_x) == 0, axis=(1, 2))
        self.data = DeviceData(
            train_x=jnp.asarray(train_x),
            mask_x=jnp.asarray(mask_x),
            train_y=jnp.asarray(train_y),
            bg_imgs=jnp.asarray(bg_imgs),
            noof_obj_pixels=jnp.asarray(noof_obj_pixels),
            occlusion_masks=(
                jnp.asarray(occlusion_masks) if occlusion_masks is not None else None
            ),
        )
        self._augment = build_augmenter(cfg.code)

    # array attribute views (API compatibility)
    @property
    def train_x(self):
        return self.data.train_x

    @property
    def mask_x(self):
        return self.data.mask_x

    @property
    def train_y(self):
        return self.data.train_y

    @property
    def bg_imgs(self):
        return self.data.bg_imgs

    @property
    def noof_obj_pixels(self):
        return self.data.noof_obj_pixels

    @property
    def occlusion_masks(self):
        return self.data.occlusion_masks

    def sample_batch(
        self, rng: Array, batch_size: int, data: Optional[DeviceData] = None
    ) -> Tuple[Array, Array]:
        """Pure function: rng -> (batch_x, batch_y) float32 in [0,1].

        Mirrors reference Dataset.batch (dataset.py:456-495) step for step.
        Pass `data` explicitly when calling from inside a jitted function so
        the arrays are traced arguments, not captured constants.
        """
        cfg = self.cfg
        d = data if data is not None else self.data
        k_idx, k_bg, k_occ, k_rocc, k_aug = jax.random.split(rng, 5)

        # without-replacement sampling like the reference (dataset.py:461-465),
        # falling back to with-replacement for pools smaller than the batch
        n = d.train_x.shape[0]
        idcs = jax.random.choice(k_idx, n, (batch_size,), replace=n < batch_size)
        n_bg = d.bg_imgs.shape[0]
        bg_idcs = jax.random.choice(
            k_bg, n_bg, (batch_size,), replace=n_bg < batch_size
        )

        batch_x = d.train_x[idcs].astype(jnp.float32)
        batch_y = d.train_y[idcs].astype(jnp.float32)
        masks = d.mask_x[idcs]

        if cfg.realistic_occlusion and d.occlusion_masks is not None:
            masks = realistic_occlusion(
                k_rocc, masks, d.occlusion_masks, max_occl=cfg.realistic_occlusion
            )
        if cfg.square_occlusion:
            masks = square_occlusion(
                k_occ, masks, d.noof_obj_pixels[idcs], max_occl=cfg.square_occlusion
            )

        bg = d.bg_imgs[bg_idcs].astype(jnp.float32)

        if cfg.neighbor_clutter:
            # paste OTHER samples' renders (shifted to the crop periphery)
            # into the background — simulates neighboring object instances
            # whose pixels enter padded detection crops in multi-instance
            # scenes. The primary object still composites on top, so only
            # the background region gains clutter. Keys are fold_in-derived:
            # the original stream is bit-identical when the knob is off, and
            # the j=0 paste with default count/shift reproduces the round-2
            # single-neighbor stream bit-for-bit (same 101..104 key path).
            lo_s, hi_s = cfg.neighbor_clutter_shift
            n_pastes = max(1, int(cfg.neighbor_clutter_count))
            for j in range(n_pastes):
                off = 101 + 10 * j
                k_nb = jax.random.fold_in(rng, off)
                k_sx = jax.random.fold_in(rng, off + 1)
                k_sy = jax.random.fold_in(rng, off + 2)
                k_ap = jax.random.fold_in(rng, off + 3)
                nb_idcs = jax.random.choice(k_nb, n, (batch_size,))
                nb_x = d.train_x[nb_idcs].astype(jnp.float32)
                nb_obj = ~d.mask_x[nb_idcs]  # mask==True is background
                Hh, Ww = nb_obj.shape[1], nb_obj.shape[2]

                def rand_shift(k, size):
                    ka, kb = jax.random.split(k)
                    mag = jax.random.randint(
                        ka, (batch_size,), int(lo_s * size), int(hi_s * size)
                    )
                    sign = jax.random.choice(kb, jnp.array([-1, 1]), (batch_size,))
                    return mag * sign

                dy = rand_shift(k_sy, Hh)
                dx = rand_shift(k_sx, Ww)

                def roll_one(img, m, sy, sx):
                    return (
                        jnp.roll(img, (sy, sx), axis=(0, 1)),
                        jnp.roll(m, (sy, sx), axis=(0, 1)),
                    )

                nb_x_s, nb_obj_s = jax.vmap(roll_one)(nb_x, nb_obj, dy, dx)
                cluttered = jnp.where(nb_obj_s[..., None], nb_x_s, bg)
                apply = jax.random.bernoulli(
                    k_ap, cfg.neighbor_clutter, (batch_size,)
                )
                bg = jnp.where(apply[:, None, None, None], cluttered, bg)

        batch_x = jnp.where(masks[..., None], bg, batch_x)

        batch_x = self._augment(k_aug, batch_x)

        return batch_x / 255.0, batch_y / 255.0

    def sampler(self, batch_size: int):
        """A jitted rng -> (x, y) closure (data passed as jit arguments)."""
        fn = jax.jit(
            lambda rng, data: self.sample_batch(rng, batch_size, data=data)
        )
        return lambda rng: fn(rng, self.data)
