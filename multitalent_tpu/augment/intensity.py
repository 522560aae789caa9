"""On-device intensity augmentation chain.

Parity targets (get_moreDA_augmentation, data_augmentation_moreDA.py:66-150):
GaussianNoise -> GaussianBlur -> BrightnessMultiplicative -> Contrast ->
SimulateLowResolution -> Gamma(inverted) -> Gamma. All transforms are branchless:
per-sample (and where applicable per-channel) Bernoulli application masks select
between transformed and identity values, so the whole chain is one fused XLA program.

data layout: (B, *spatial, C) float32 — rank-agnostic (3D and 2D patches).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

def _spatial(data):
    return tuple(range(1, data.ndim - 1))


def _bcast(x, ndim):
    """(B, C) per-sample-channel scalar -> broadcastable (B, 1, ..., 1, C)."""
    return x.reshape((x.shape[0],) + (1,) * (ndim - 2) + (x.shape[-1],))


def _bcast_b(x, ndim):
    """(B,) per-sample scalar -> broadcastable (B, 1, ..., 1)."""
    return x.reshape((x.shape[0],) + (1,) * (ndim - 1))


def gaussian_noise(rng, data, p=0.1, variance=(0.0, 0.1)):
    k1, k2, k3 = jax.random.split(rng, 3)
    b = data.shape[0]
    apply = jax.random.uniform(k1, (b,)) < p
    # the reference samples "variance" and uses it as the normal's scale
    sigma = jax.random.uniform(k2, (b,), minval=variance[0], maxval=variance[1])
    noise = jax.random.normal(k3, data.shape) * _bcast_b(sigma, data.ndim)
    return jnp.where(_bcast_b(apply, data.ndim), data + noise, data)


def gaussian_blur(rng, data, p=0.2, p_per_channel=0.5, sigma_range=(0.5, 1.0), radius=3):
    b, c = data.shape[0], data.shape[-1]
    k1, k2, k3 = jax.random.split(rng, 3)
    apply_sample = jax.random.uniform(k1, (b,)) < p
    apply_channel = jax.random.uniform(k2, (b, c)) < p_per_channel
    sigma = jax.random.uniform(k3, (b, c), minval=sigma_range[0], maxval=sigma_range[1])
    taps = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    w = jnp.exp(-0.5 * (taps[None, None, :] / sigma[..., None]) ** 2)
    w = w / jnp.sum(w, axis=-1, keepdims=True)  # (B, C, K)

    blurred = data
    for axis in _spatial(data):
        # weights indexed (B, C, K); build the shifted sum explicitly
        k = w.shape[-1]
        r = k // 2
        pad = [(0, 0)] * blurred.ndim
        pad[axis] = (r, r)
        xp = jnp.pad(blurred, pad, mode="reflect")
        acc = jnp.zeros_like(blurred)
        for i in range(k):
            sl = [slice(None)] * blurred.ndim
            sl[axis] = slice(i, i + blurred.shape[axis])
            acc = acc + xp[tuple(sl)] * _bcast(w[..., i], data.ndim)
        blurred = acc
    apply = apply_sample[:, None] & apply_channel  # (B, C)
    return jnp.where(_bcast(apply.astype(bool), data.ndim), blurred, data)


def brightness_multiplicative(rng, data, p=0.15, mult_range=(0.75, 1.25)):
    b, c = data.shape[0], data.shape[-1]
    k1, k2 = jax.random.split(rng)
    apply = jax.random.uniform(k1, (b,)) < p
    mult = jax.random.uniform(k2, (b, c), minval=mult_range[0], maxval=mult_range[1])
    out = data * _bcast(mult, data.ndim)
    return jnp.where(_bcast_b(apply, data.ndim), out, data)


def brightness_additive(rng, data, p=0.15, mu=0.0, sigma=0.1):
    """Add a per-sample gaussian offset (BrightnessTransform — the ADDITIVE
    one, used by the DA2/DA5 pipelines via do_additive_brightness)."""
    b = data.shape[0]
    k1, k2 = jax.random.split(rng)
    offs = mu + sigma * jax.random.normal(k1, (b,))
    apply = jax.random.uniform(k2, (b,)) < p
    offs = jnp.where(apply, offs, 0.0)
    return data + _bcast_b(offs, data.ndim)


def contrast_augmentation(rng, data, p=0.15, contrast_range=(0.75, 1.25),
                          preserve_range=True):
    b, c = data.shape[0], data.shape[-1]
    k1, k2 = jax.random.split(rng)
    apply = jax.random.uniform(k1, (b,)) < p
    factor = jax.random.uniform(k2, (b, c), minval=contrast_range[0],
                                maxval=contrast_range[1])
    mean = jnp.mean(data, axis=_spatial(data), keepdims=True)
    out = (data - mean) * _bcast(factor, data.ndim) + mean
    if preserve_range:
        mn = jnp.min(data, axis=_spatial(data), keepdims=True)
        mx = jnp.max(data, axis=_spatial(data), keepdims=True)
        out = jnp.clip(out, mn, mx)
    return jnp.where(_bcast_b(apply, data.ndim), out, data)


def simulate_low_resolution(rng, data, p=0.25, p_per_channel=0.5, zoom_range=(0.5, 1.0)):
    """Pixelation: sample at a coarse grid (nearest) then linearly re-interpolate.
    Equivalent to the reference's zoom-down(order 0)/zoom-up transform, expressed with
    static shapes: coords are snapped to a virtual low-res grid of spacing 1/zoom."""
    b, c = data.shape[0], data.shape[-1]
    k1, k2, k3 = jax.random.split(rng, 3)
    apply_sample = jax.random.uniform(k1, (b,)) < p
    apply_channel = jax.random.uniform(k2, (b, c)) < p_per_channel
    zoom = jax.random.uniform(k3, (b,), minval=zoom_range[0], maxval=zoom_range[1])

    def pixelate_one(vol, z):
        # vol (*spatial, C); virtual low-res cell size s = 1/z >= 1
        out = vol
        for axis in range(vol.ndim - 1):
            n = vol.shape[axis]
            idx = jnp.arange(n, dtype=jnp.float32)
            cell = jnp.floor(idx * z) + 0.5  # low-res cell center (in low-res units)
            src = jnp.clip(jnp.round(cell / z - 0.5), 0, n - 1).astype(jnp.int32)
            out = jnp.take(out, src, axis=axis)
        return out

    pix = jax.vmap(pixelate_one)(data, zoom)
    apply = apply_sample[:, None] & apply_channel
    return jnp.where(_bcast(apply.astype(bool), data.ndim), pix, data)


def _gamma_core(rng, data, gamma_range, invert):
    b, c = data.shape[0], data.shape[-1]
    k1, k2, k3 = jax.random.split(rng, 3)
    # gamma < 1 and > 1 sampled with equal probability (GammaTransform semantics)
    pick_lo = jax.random.uniform(k1, (b, c)) < 0.5
    g_lo = jax.random.uniform(k2, (b, c), minval=gamma_range[0], maxval=1.0)
    g_hi = jax.random.uniform(k3, (b, c), minval=1.0, maxval=gamma_range[1])
    gamma = jnp.where(pick_lo, g_lo, g_hi)

    sp = _spatial(data)
    x = -data if invert else data
    mn_stat = jnp.mean(x, axis=sp, keepdims=True)
    sd_stat = jnp.std(x, axis=sp, keepdims=True)
    mn = jnp.min(x, axis=sp, keepdims=True)
    rnge = jnp.max(x, axis=sp, keepdims=True) - mn
    eps = 1e-7
    y = jnp.power((x - mn) / (rnge + eps), _bcast(gamma, data.ndim)) * (rnge + eps) + mn
    # retain_stats: restore per-channel mean/std
    y = (y - jnp.mean(y, axis=sp, keepdims=True)) / (
        jnp.std(y, axis=sp, keepdims=True) + 1e-8) * sd_stat + mn_stat
    return -y if invert else y


def gamma_augmentation(rng, data, p=0.3, gamma_range=(0.7, 1.5), invert=False):
    b = data.shape[0]
    k1, k2 = jax.random.split(rng)
    apply = jax.random.uniform(k1, (b,)) < p
    out = _gamma_core(k2, data, gamma_range, invert)
    return jnp.where(_bcast_b(apply, data.ndim), out, data)
