"""On-device domain randomization: the cfg augmentation chain as one jitted op.

The reference applies an imgaug pipeline on the host from 10 producer threads
(auto_pose/ae/dataset.py:488, queue.py:41-74). Here the same chain (parsed
into augment_spec dataclasses) compiles into a single pure JAX batch
transform, fused by XLA into the training step — no host round-trip.

Images flow as float32 in [0, 255] (uint8 saturation semantics are kept by
clipping after every value op); `Sometimes` is branchless: both paths are
computed and selected per image, which is the right trade on TPU (the VPU is
wide; data-dependent control flow is not).

Semantics per op follow imgaug's defaults for the subset the reference uses
(train_template.cfg:26-37); integer `Add` ranges sample discrete uniforms,
`per_channel=q` draws the per-channel decision per image with prob q.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

from . import augment_spec as S

Array = jax.Array
AugFn = Callable[[Array, Array], Array]  # (rng, imgs[B,H,W,C]) -> imgs


# ------------------------------------------------------------------ helpers

def _per_image_param(rng, batch, channels, lo, hi, per_channel, discrete=False):
    """Sample a (B, 1, 1, C) parameter: per image, optionally per channel.

    With prob `per_channel` an image gets independent per-channel samples,
    else one sample broadcast over channels (imgaug per_channel semantics).
    """
    k1, k2, k3 = jax.random.split(rng, 3)
    if discrete:
        shared = jax.random.randint(k1, (batch, 1, 1, 1), int(lo), int(hi) + 1).astype(
            jnp.float32
        )
        per_ch = jax.random.randint(k2, (batch, 1, 1, channels), int(lo), int(hi) + 1).astype(
            jnp.float32
        )
    else:
        shared = jax.random.uniform(k1, (batch, 1, 1, 1), minval=lo, maxval=hi)
        per_ch = jax.random.uniform(k2, (batch, 1, 1, channels), minval=lo, maxval=hi)
    if per_channel <= 0.0:
        return jnp.broadcast_to(shared, (batch, 1, 1, channels))
    if per_channel >= 1.0:
        return per_ch
    use_pc = jax.random.bernoulli(k3, per_channel, (batch, 1, 1, 1))
    return jnp.where(use_pc, per_ch, shared)


def _bilinear_sample(img: Array, ys: Array, xs: Array) -> Array:
    """Bilinear sample img[H,W,C] at float coords; zeros outside."""
    h, w, _ = img.shape
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = (ys - y0)[..., None]
    wx = (xs - x0)[..., None]
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    def fetch(yi, xi):
        inside = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        return img[yc, xc] * inside[..., None]

    v00 = fetch(y0i, x0i)
    v01 = fetch(y0i, x0i + 1)
    v10 = fetch(y0i + 1, x0i)
    v11 = fetch(y0i + 1, x0i + 1)
    return (
        v00 * (1 - wy) * (1 - wx)
        + v01 * (1 - wy) * wx
        + v10 * wy * (1 - wx)
        + v11 * wy * wx
    )


# ------------------------------------------------------------------ ops

def _interp_matrix(coords: Array, n: int) -> Array:
    """(B, m) float source coords -> (B, m, n) bilinear interpolation matrix.

    Row r holds the 2-tap bilinear weights selecting source samples for
    output position r; out-of-range coords produce zero rows (constant-0
    padding). Resampling becomes a matmul — MXU instead of gathers.
    """
    lo = jnp.floor(coords)
    frac = coords - lo
    loi = lo.astype(jnp.int32)
    grid = jnp.arange(n)
    onehot_lo = (loi[..., None] == grid).astype(jnp.float32)
    onehot_hi = (loi[..., None] + 1 == grid).astype(jnp.float32)
    inside = ((coords >= 0) & (coords <= n - 1))[..., None]
    m = onehot_lo * (1.0 - frac)[..., None] + onehot_hi * frac[..., None]
    # exact right-edge hit: frac 0 -> fully on onehot_lo, already correct
    return m * inside


def _affine_scale(spec: S.Affine, rng, imgs):
    # center scaling is separable: per-image (H,H) and (W,W) interpolation
    # matrices turn the bilinear warp into two batched matmuls
    b, h, w, _ = imgs.shape
    lo, hi = S.as_range(spec.scale)
    scales = jax.random.uniform(rng, (b,), minval=lo, maxval=hi)
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    ys = (jnp.arange(h, dtype=jnp.float32)[None, :] - cy) / scales[:, None] + cy
    xs = (jnp.arange(w, dtype=jnp.float32)[None, :] - cx) / scales[:, None] + cx
    My = _interp_matrix(ys, h)  # (B, H, H): out row <- in row
    Mx = _interp_matrix(xs, w)  # (B, W, W): out col <- in col
    tmp = jnp.einsum("bhj,bjwc->bhwc", My, imgs)
    return jnp.einsum("bwk,bhkc->bhwc", Mx, tmp)


def _coarse_dropout(spec: S.CoarseDropout, rng, imgs):
    b, h, w, c = imgs.shape
    gh = max(1, int(round(h * spec.size_percent)))
    gw = max(1, int(round(w * spec.size_percent)))
    k1, k2, k3 = jax.random.split(rng, 3)
    keep_shared = jax.random.bernoulli(k1, 1.0 - spec.p, (b, gh, gw, 1))
    if spec.per_channel > 0.0:
        keep_pc = jax.random.bernoulli(k2, 1.0 - spec.p, (b, gh, gw, c))
        use_pc = jax.random.bernoulli(k3, spec.per_channel, (b, 1, 1, 1))
        keep = jnp.where(use_pc, keep_pc, keep_shared)
    else:
        keep = jnp.broadcast_to(keep_shared, (b, gh, gw, 1))
    # nearest-neighbor upsample of the low-res keep mask
    ridx = (jnp.arange(h) * gh // h).astype(jnp.int32)
    cidx = (jnp.arange(w) * gw // w).astype(jnp.int32)
    keep_full = keep[:, ridx][:, :, cidx]
    return imgs * keep_full


def _dropout(spec: S.Dropout, rng, imgs):
    b, h, w, c = imgs.shape
    k1, k2, k3 = jax.random.split(rng, 3)
    keep_shared = jax.random.bernoulli(k1, 1.0 - spec.p, (b, h, w, 1))
    if spec.per_channel >= 1.0:
        return imgs * jax.random.bernoulli(k2, 1.0 - spec.p, (b, h, w, c))
    if spec.per_channel > 0.0:
        # imgaug fractional per_channel: each image independently chooses
        # per-channel vs shared dropout with prob per_channel
        keep_pc = jax.random.bernoulli(k2, 1.0 - spec.p, (b, h, w, c))
        use_pc = jax.random.bernoulli(k3, spec.per_channel, (b, 1, 1, 1))
        return imgs * jnp.where(use_pc, keep_pc, keep_shared)
    return imgs * keep_shared


def _gaussian_blur(spec: S.GaussianBlur, rng, imgs):
    lo, hi = S.as_range(spec.sigma)
    if hi < 1e-3:
        return imgs
    b, h, w, c = imgs.shape
    radius = max(1, int(math.ceil(2.6 * hi)))
    offs = jnp.arange(-radius, radius + 1, dtype=jnp.float32)

    x = jnp.pad(imgs, ((0, 0), (radius, radius), (radius, radius), (0, 0)), mode="edge")

    if lo == hi:
        # scalar sigma (the reference chain's case — fixed at parse time):
        # ONE batched depthwise separable conv over (B, H, W, C)
        k1d = jnp.exp(-0.5 * (offs / hi) ** 2)
        k1d = k1d / k1d.sum()
        dn = jax.lax.conv_dimension_numbers(x.shape, (1, 1, 1, 1), ("NHWC", "HWIO", "NHWC"))
        kv = jnp.tile(k1d.reshape(-1, 1, 1, 1), (1, 1, 1, c))
        kh = jnp.tile(k1d.reshape(1, -1, 1, 1), (1, 1, 1, c))
        y = jax.lax.conv_general_dilated(
            x, kv, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c
        )
        y = jax.lax.conv_general_dilated(
            y, kh, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c
        )
        return y

    # per-image sigma: separable blur as two batched matmuls against banded
    # Toeplitz weight matrices (MXU-friendly, no per-image conv dispatch)
    sigmas = jax.random.uniform(rng, (b,), minval=lo, maxval=hi)
    kern = jnp.exp(-0.5 * (offs[None, :] / jnp.maximum(sigmas[:, None], 1e-6)) ** 2)
    ident = (offs == 0).astype(jnp.float32)[None, :]
    kern = jnp.where((sigmas < 1e-3)[:, None], ident, kern)
    kern = kern / kern.sum(axis=1, keepdims=True)  # (B, 2r+1)

    def banded(n):
        # (B, n, n + 2r): row i holds kern at cols i..i+2r
        rows = jax.lax.broadcasted_iota(jnp.int32, (n, n + 2 * radius), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (n, n + 2 * radius), 1)
        offset = cols - rows  # in [0, 2r] inside the band
        band = (offset >= 0) & (offset <= 2 * radius)
        idx = jnp.clip(offset, 0, 2 * radius)
        return jnp.where(band[None], kern[:, idx], 0.0)  # (B, n, n+2r)

    Mv = banded(h)  # (B, h, h+2r) applied to padded rows
    Mh = banded(w)  # (B, w, w+2r) applied to padded cols
    tmp = jnp.einsum("bhj,bjwc->bhwc", Mv, x)  # rows: (B, h, w+2r, c)
    return jnp.einsum("bwk,bhkc->bhwc", Mh, tmp)  # cols: (B, h, w, c)


def _add(spec: S.Add, rng, imgs):
    b, _, _, c = imgs.shape
    lo, hi = S.as_range(spec.value)
    discrete = float(lo).is_integer() and float(hi).is_integer()
    v = _per_image_param(rng, b, c, lo, hi, spec.per_channel, discrete=discrete)
    return jnp.clip(imgs + v, 0.0, 255.0)


def _additive_gaussian_noise(spec: S.AdditiveGaussianNoise, rng, imgs):
    b, h, w, c = imgs.shape
    lo, hi = S.as_range(spec.scale)
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    scale = jax.random.uniform(k1, (b, 1, 1, 1), minval=lo, maxval=hi)
    nshape = (b, h, w, c if spec.per_channel >= 1.0 else 1)
    noise = jax.random.normal(k2, nshape) * scale + spec.loc
    if 0.0 < spec.per_channel < 1.0:
        # independent keys for the per-channel draw and the use_pc decision
        # (sharing one key correlates the noise with the branch choice)
        noise_pc = jax.random.normal(k3, (b, h, w, c)) * scale + spec.loc
        use_pc = jax.random.bernoulli(k4, spec.per_channel, (b, 1, 1, 1))
        noise = jnp.where(use_pc, noise_pc, jnp.broadcast_to(noise, (b, h, w, c)))
    return jnp.clip(imgs + noise, 0.0, 255.0)


def _multiply(spec: S.Multiply, rng, imgs):
    b, _, _, c = imgs.shape
    lo, hi = S.as_range(spec.mul)
    m = _per_image_param(rng, b, c, lo, hi, spec.per_channel)
    return jnp.clip(imgs * m, 0.0, 255.0)


def _invert(spec: S.Invert, rng, imgs):
    b, _, _, c = imgs.shape
    k1, k2, k3 = jax.random.split(rng, 3)
    inv_shared = jax.random.bernoulli(k1, spec.p, (b, 1, 1, 1))
    if spec.per_channel > 0.0:
        inv_pc = jax.random.bernoulli(k2, spec.p, (b, 1, 1, c))
        use_pc = jax.random.bernoulli(k3, spec.per_channel, (b, 1, 1, 1))
        inv = jnp.where(use_pc, inv_pc, inv_shared)
    else:
        inv = inv_shared
    return jnp.where(inv, 255.0 - imgs, imgs)


def _contrast_normalization(spec: S.ContrastNormalization, rng, imgs):
    b, _, _, c = imgs.shape
    lo, hi = S.as_range(spec.alpha)
    alpha = _per_image_param(rng, b, c, lo, hi, spec.per_channel)
    return jnp.clip((imgs - 128.0) * alpha + 128.0, 0.0, 255.0)


def _fliplr(spec: S.Fliplr, rng, imgs):
    flip = jax.random.bernoulli(rng, spec.p, (imgs.shape[0], 1, 1, 1))
    return jnp.where(flip, imgs[:, :, ::-1], imgs)


def _flipud(spec: S.Flipud, rng, imgs):
    flip = jax.random.bernoulli(rng, spec.p, (imgs.shape[0], 1, 1, 1))
    return jnp.where(flip, imgs[:, ::-1], imgs)


def _grayscale(spec: S.Grayscale, rng, imgs):
    b, _, _, c = imgs.shape
    lo, hi = S.as_range(spec.alpha)
    alpha = jax.random.uniform(rng, (b, 1, 1, 1), minval=lo, maxval=hi)
    if c == 3:
        # images are BGR (cv2 convention throughout the pipeline)
        gray = (
            0.114 * imgs[..., 0] + 0.587 * imgs[..., 1] + 0.299 * imgs[..., 2]
        )[..., None]
    else:
        gray = imgs.mean(axis=-1, keepdims=True)
    return imgs * (1 - alpha) + gray * alpha


_OP_TABLE = {
    S.Affine: _affine_scale,
    S.CoarseDropout: _coarse_dropout,
    S.Dropout: _dropout,
    S.GaussianBlur: _gaussian_blur,
    S.Add: _add,
    S.AdditiveGaussianNoise: _additive_gaussian_noise,
    S.Multiply: _multiply,
    S.Invert: _invert,
    S.ContrastNormalization: _contrast_normalization,
    S.Fliplr: _fliplr,
    S.Flipud: _flipud,
    S.Grayscale: _grayscale,
}


# ------------------------------------------------------------------ compiler

def build_augmenter(spec: S.AugSpec) -> AugFn:
    """Compile an AugSpec tree into a pure (rng, imgs)->imgs function."""
    if spec is None:
        return lambda rng, imgs: imgs

    if isinstance(spec, S.Noop):
        return lambda rng, imgs: imgs

    if isinstance(spec, S.Sequential):
        children = [build_augmenter(c) for c in spec.children]

        if spec.random_order:
            # imgaug Sequential(random_order=True): a fresh op order per
            # batch. Sample a permutation, then run n fixed steps, each a
            # lax.switch over all children on the permuted op index —
            # static shapes, jit-safe (not in the reference default chain
            # but accepted from cfg CODE).
            n = len(children)

            def seq_random(rng, imgs):
                kperm, *kops = jax.random.split(rng, n + 1)
                perm = jax.random.permutation(kperm, n)
                for j in range(n):
                    branches = [
                        (lambda fn: lambda im: fn(kops[j], im))(fn)
                        for fn in children
                    ]
                    imgs = jax.lax.switch(perm[j], branches, imgs)
                return imgs

            return seq_random

        def seq(rng, imgs):
            for fn in children:
                rng, sub = jax.random.split(rng)
                imgs = fn(sub, imgs)
            return imgs

        return seq

    if isinstance(spec, S.Sometimes):
        child = build_augmenter(spec.child)
        p = float(spec.p)

        def sometimes(rng, imgs):
            k1, k2 = jax.random.split(rng)
            apply_mask = jax.random.bernoulli(k1, p, (imgs.shape[0], 1, 1, 1))
            return jnp.where(apply_mask, child(k2, imgs), imgs)

        return sometimes

    if isinstance(spec, S.OneOf):
        children = [build_augmenter(c) for c in spec.children]
        n = len(children)

        def one_of(rng, imgs):
            keys = jax.random.split(rng, n + 1)
            choice = jax.random.randint(keys[0], (imgs.shape[0], 1, 1, 1), 0, n)
            out = imgs
            for i, fn in enumerate(children):
                out = jnp.where(choice == i, fn(keys[i + 1], imgs), out)
            return out

        return one_of

    op = _OP_TABLE.get(type(spec))
    if op is None:
        raise NotImplementedError(f"augmenter not implemented: {type(spec).__name__}")
    return partial(op, spec)
