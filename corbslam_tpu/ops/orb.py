"""Full ORB feature extractor: pyramid -> FAST -> orientation -> BRIEF.

The TPU-native equivalent of `ORBextractor::operator()` (ref:
corbslam_client/src/ORBextractor.cc:1043): one jitted program per image
geometry that produces a fixed-capacity keypoint set across all pyramid
levels. Output coordinates are in level-0 pixels (the reference rescales by
`scale` at ORBextractor.cc:1097-1100).

Returned `Features` is a flat SoA batch — the device-resident form of the
reference's vector<cv::KeyPoint> + descriptor Mat.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import OrbConfig
from . import brief, fast, pyramid


class Features(NamedTuple):
    xy: jnp.ndarray        # [N, 2] f32, level-0 pixel coords (x, y)
    response: jnp.ndarray  # [N] f32 FAST score
    angle: jnp.ndarray     # [N] f32 radians
    octave: jnp.ndarray    # [N] i32 pyramid level
    desc: jnp.ndarray      # [N, 32] u8 packed BRIEF-256
    valid: jnp.ndarray     # [N] bool

    @property
    def n(self):
        return self.xy.shape[0]


def _extract_level(img, blurred, n_kp, cfg: OrbConfig):
    xy, resp, valid = fast.detect(
        img, cfg.ini_th_fast, cfg.cell_size, n_kp, cfg.min_th_fast
    )
    angle = brief.compute_orientation(img, xy)
    desc = brief.compute_brief(blurred, xy, angle)
    return xy, resp, angle, desc, valid


def extract(img: jnp.ndarray, cfg: OrbConfig) -> Features:
    """img [H, W] f32 (grayscale, 0..255) -> Features with capacity
    sum(features_per_level) == cfg.n_features."""
    levels, blurred = pyramid.build_pyramid(img, cfg.n_levels, cfg.scale_factor)
    budgets = cfg.features_per_level()
    scales = cfg.scales()

    parts = []
    for lvl in range(cfg.n_levels):
        xy, resp, angle, desc, valid = _extract_level(
            levels[lvl], blurred[lvl], budgets[lvl], cfg
        )
        xy0 = xy * scales[lvl]  # back to level-0 coords
        octave = jnp.full(xy.shape[0], lvl, jnp.int32)
        parts.append((xy0, resp, angle, octave, desc, valid))

    xy = jnp.concatenate([p[0] for p in parts])
    resp = jnp.concatenate([p[1] for p in parts])
    angle = jnp.concatenate([p[2] for p in parts])
    octave = jnp.concatenate([p[3] for p in parts])
    desc = jnp.concatenate([p[4] for p in parts])
    valid = jnp.concatenate([p[5] for p in parts])
    return Features(xy, resp, angle, octave, desc, valid)


@partial(jax.jit, static_argnames=("cfg",))
def extract_jit(img: jnp.ndarray, cfg: OrbConfig) -> Features:
    return extract(img, cfg)
