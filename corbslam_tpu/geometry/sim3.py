"""Batched Sim(3) (similarity) transforms.

Replaces the reference's `g2o::Sim3` (ref:
corbslam_client/Thirdparty/g2o/g2o/types/sim3.h) used by loop closing and
server map fusion. A Sim3 element is stored as ``(R [...,3,3], t [...,3],
s [...])`` — scale kept separate from the rotation so SE3 interop is free.
Tangent layout: ``[..., 7] = (rho, phi, sigma)`` with ``s = exp(sigma)``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_PREC = jax.lax.Precision.HIGHEST

from . import se3

_EPS = 1e-8


def identity(batch_shape=(), dtype=jnp.float32):
    R = jnp.broadcast_to(jnp.eye(3, dtype=dtype), tuple(batch_shape) + (3, 3))
    t = jnp.zeros(tuple(batch_shape) + (3,), dtype)
    s = jnp.ones(tuple(batch_shape), dtype)
    return R, t, s


def from_se3(T: jnp.ndarray):
    return se3.rotation(T), se3.translation(T), jnp.ones(T.shape[:-2], T.dtype)


def to_matrix(S) -> jnp.ndarray:
    """(R, t, s) -> [..., 4, 4] with sR in the rotation block."""
    R, t, s = S
    return se3.from_Rt(s[..., None, None] * R, t)


def transform(S, p: jnp.ndarray) -> jnp.ndarray:
    """p' = s R p + t."""
    R, t, s = S
    return s[..., None] * jnp.einsum("...ij,...j->...i", R, p, precision=_PREC) + t


def compose(A, B):
    """A ∘ B: (s_a R_a (s_b R_b x + t_b) + t_a)."""
    Ra, ta, sa = A
    Rb, tb, sb = B
    R = jnp.matmul(Ra, Rb, precision=_PREC)
    s = sa * sb
    t = sa[..., None] * jnp.einsum("...ij,...j->...i", Ra, tb, precision=_PREC) + ta
    return R, t, s


def inverse(S):
    R, t, s = S
    Rt = jnp.swapaxes(R, -1, -2)
    s_inv = 1.0 / jnp.maximum(s, _EPS)
    t_inv = -s_inv[..., None] * jnp.einsum("...ij,...j->...i", Rt, t, precision=_PREC)
    return Rt, t_inv, s_inv


def exp(xi: jnp.ndarray):
    """sim(3) exp, [..., 7] (rho, phi, sigma) -> (R, t, s).

    Uses the closed-form W matrix (Strasdat'10): t = W rho with
    W = a I + b K + c K^2 built from (theta, sigma) coefficient functions.
    """
    rho, phi, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    s = jnp.exp(sigma)
    R = se3.so3_exp(phi)
    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    K = se3.hat(phi)
    I = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), K.shape)

    sig2 = sigma * sigma
    small_sig = jnp.abs(sigma) < 1e-5
    small_th = theta < 1e-5

    # A = (s - 1)/sigma
    A = jnp.where(small_sig, 1.0 + sigma / 2.0 + sig2 / 6.0, (s - 1.0) / jnp.where(small_sig, 1.0, sigma))

    denom = sig2 + theta2
    denom = jnp.maximum(denom, _EPS)
    s_cos = s * jnp.cos(theta)
    s_sin = s * jnp.sin(theta)
    # B = (sigma*s*sin + theta*(1 - s*cos)) / (theta*(sigma^2+theta^2))
    B_gen = (sigma * s_sin + theta * (1.0 - s_cos)) / (jnp.maximum(theta, _EPS) * denom)
    B_small = jnp.where(small_sig, 0.5 + sigma / 3.0, (s * (1.0 - sigma) - 1.0 + sig2 * A) / jnp.where(small_sig, 1.0, denom))
    # For theta small: B -> limit of (1 - s*cos)/... ; use series 1/2 * A-ish.
    B = jnp.where(small_th, B_small, B_gen)

    # C = (A - B_rot_part)/theta^2 form:
    # C = ( (s-1)/sigma - ((s*cos - 1)*sigma + s*sin*theta) / (sigma^2+theta^2) ) / theta^2
    C_gen = (A - ((s_cos - 1.0) * sigma + s_sin * theta) / denom) / jnp.maximum(theta2, _EPS)
    C_small = jnp.where(small_sig, 1.0 / 6.0 + sigma / 8.0, (A - sigma * (s - 1.0 - sig2 * A) / jnp.where(small_sig, 1.0, denom)) / jnp.maximum(theta2, 1.0))
    C = jnp.where(small_th, C_small, C_gen)

    W = A[..., None, None] * I + B[..., None, None] * K + C[..., None, None] * jnp.matmul(K, K, precision=_PREC)
    t = jnp.einsum("...ij,...j->...i", W, rho, precision=_PREC)
    return R, t, s


def log(S) -> jnp.ndarray:
    """(R, t, s) -> [..., 7]. Inverse of `exp` via solving W rho = t."""
    R, t, s = S
    phi = se3.so3_log(R)
    sigma = jnp.log(jnp.maximum(s, _EPS))
    # Rebuild W from (phi, sigma) and solve the 3x3 system W rho = t.
    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    K = se3.hat(phi)
    I = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    sig2 = sigma * sigma
    small_sig = jnp.abs(sigma) < 1e-5
    small_th = theta < 1e-5
    A = jnp.where(small_sig, 1.0 + sigma / 2.0 + sig2 / 6.0, (s - 1.0) / jnp.where(small_sig, 1.0, sigma))
    denom = jnp.maximum(sig2 + theta2, _EPS)
    s_cos = s * jnp.cos(theta)
    s_sin = s * jnp.sin(theta)
    B_gen = (sigma * s_sin + theta * (1.0 - s_cos)) / (jnp.maximum(theta, _EPS) * denom)
    B_small = jnp.where(small_sig, 0.5 + sigma / 3.0, (s * (1.0 - sigma) - 1.0 + sig2 * A) / jnp.where(small_sig, 1.0, denom))
    B = jnp.where(small_th, B_small, B_gen)
    C_gen = (A - ((s_cos - 1.0) * sigma + s_sin * theta) / denom) / jnp.maximum(theta2, _EPS)
    C_small = jnp.where(small_sig, 1.0 / 6.0 + sigma / 8.0, A * 0 + 1.0 / 6.0)
    C = jnp.where(small_th, C_small, C_gen)
    W = A[..., None, None] * I + B[..., None, None] * K + C[..., None, None] * jnp.matmul(K, K, precision=_PREC)
    rho = jnp.linalg.solve(W, t[..., None])[..., 0]
    return jnp.concatenate([rho, phi, sigma[..., None]], axis=-1)


def retract(S, xi: jnp.ndarray):
    """Left-multiplicative update exp(xi) ∘ S."""
    return compose(exp(xi), S)
