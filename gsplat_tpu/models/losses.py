"""Photometric losses and image metrics (jnp, differentiable).

The standard 3DGS training objective is (1-lam)*L1 + lam*(1 - SSIM) with
lam = 0.2; the reference has no training at all (SURVEY.md "critical
facts"), so these follow the original 3DGS formulation. SSIM uses the
classic 11x11 Gaussian window, sigma=1.5, evaluated as two separable
depthwise convolutions — XLA lowers them onto the MXU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_C1 = 0.01 ** 2
_C2 = 0.03 ** 2


def l1_loss(image: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(image - target))


def l2_loss(image: jax.Array, target: jax.Array) -> jax.Array:
    return 0.5 * jnp.mean((image - target) ** 2)


def psnr(image: jax.Array, target: jax.Array, max_val: float = 1.0
         ) -> jax.Array:
    """Peak signal-to-noise ratio in dB."""
    mse = jnp.mean((image - target) ** 2)
    return 10.0 * jnp.log10(max_val * max_val / jnp.maximum(mse, 1e-12))


@functools.lru_cache(maxsize=8)
def _gauss_window(size: int, sigma: float):
    # numpy on purpose: an lru_cache holding a traced jnp array would leak
    # tracers across jit/shard_map scopes (UnexpectedTracerError)
    import numpy as np

    x = np.arange(size, dtype=np.float32) - (size - 1) / 2.0
    w = np.exp(-0.5 * (x / sigma) ** 2)
    return w / np.sum(w)


def _blur(img: jax.Array, size: int, sigma: float) -> jax.Array:
    """Separable Gaussian blur of [H, W, C] (SAME padding)."""
    w = jnp.asarray(_gauss_window(size, sigma))
    c = img.shape[-1]
    x = img[None]                                    # [1, H, W, C]
    kh = jnp.tile(w[:, None, None, None], (1, 1, 1, c))  # [S,1,1,C]
    kw = jnp.tile(w[None, :, None, None], (1, 1, 1, c))
    dn = jax.lax.conv_dimension_numbers(x.shape, kh.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    x = jax.lax.conv_general_dilated(
        x, kh, (1, 1), "SAME", dimension_numbers=dn, feature_group_count=c)
    x = jax.lax.conv_general_dilated(
        x, kw, (1, 1), "SAME", dimension_numbers=dn, feature_group_count=c)
    return x[0]


def ssim(image: jax.Array, target: jax.Array, *, window: int = 11,
         sigma: float = 1.5) -> jax.Array:
    """Mean SSIM over an [H, W, C] image pair (values in [0, 1]).

    Border windows are renormalized by the blurred-ones mass (SAME-padded
    zeros otherwise attenuate border means, driving the local variance
    estimate negative — observed as per-view SSIM of 1.01 and -0.79 on
    real renders before this fix)."""
    m = _blur(jnp.ones_like(image[..., :1]), window, sigma)
    mu_x = _blur(image, window, sigma) / m
    mu_y = _blur(target, window, sigma) / m
    mu_x2, mu_y2, mu_xy = mu_x * mu_x, mu_y * mu_y, mu_x * mu_y
    sig_x2 = jnp.maximum(_blur(image * image, window, sigma) / m - mu_x2,
                         0.0)
    sig_y2 = jnp.maximum(_blur(target * target, window, sigma) / m - mu_y2,
                         0.0)
    sig_xy = _blur(image * target, window, sigma) / m - mu_xy
    num = (2.0 * mu_xy + _C1) * (2.0 * sig_xy + _C2)
    den = (mu_x2 + mu_y2 + _C1) * (sig_x2 + sig_y2 + _C2)
    return jnp.mean(num / den)


def dssim_l1_loss(image: jax.Array, target: jax.Array,
                  lam: float = 0.2) -> jax.Array:
    """The standard 3DGS objective: (1-lam)*L1 + lam*(1 - SSIM)."""
    return (1.0 - lam) * l1_loss(image, target) + lam * (
        1.0 - ssim(image, target))
