"""Tests for the ORB front-end kernels (pyramid, FAST, BRIEF, full extract).

The reference validates these only visually/end-to-end (SURVEY.md §4); here
each kernel gets a synthetic-ground-truth check, plus view-invariance checks
matching become the parity criterion (SURVEY.md §7.2 step 2: "match counts
within tolerance", not bit-exactness).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from corbslam_tpu.config import OrbConfig
from corbslam_tpu.io import synthetic
from corbslam_tpu.ops import brief, descriptors, fast, orb, pyramid


class TestPyramid:
    def test_level_shapes(self):
        shapes = pyramid.level_shapes(376, 1241, 8, 1.2)
        assert shapes[0] == (376, 1241)
        assert shapes[1] == (313, 1034)
        assert all(s[0] >= 16 for s in shapes)

    def test_blur_preserves_mean(self, rng):
        img = jnp.asarray(rng.uniform(0, 255, (64, 96)).astype(np.float32))
        out = pyramid.gaussian_blur(img)
        assert abs(float(out.mean()) - float(img.mean())) < 2.0
        # Blur reduces variance
        assert float(out.var()) < float(img.var())


class TestFast:
    def test_detects_planted_corners(self):
        # Dark image with bright squares: their corners are FAST corners.
        img = np.zeros((128, 128), np.float32)
        corners = [(32, 32), (32, 96), (96, 32), (96, 96)]
        for (cy, cx) in corners:
            img[cy : cy + 20, cx : cx + 20] = 200.0
        score = np.asarray(fast.fast_score_map(jnp.asarray(img), 20.0))
        # Each square corner pixel region should contain positive scores.
        for (cy, cx) in corners:
            assert score[cy - 2 : cy + 3, cx - 2 : cx + 3].max() > 0, (cy, cx)
        # Flat regions have zero score.
        assert score[60:70, 60:70].max() == 0.0

    def test_no_corners_on_flat(self):
        img = jnp.full((64, 64), 100.0)
        score = np.asarray(fast.fast_score_map(img, 7.0))
        assert score.max() == 0.0

    def test_grid_selection_spreads(self):
        img = jnp.asarray(synthetic.random_texture(128, 128, seed=1))
        score = fast.nms3x3(fast.fast_score_map(img, 7.0))
        xy, resp, valid = fast.select_keypoints_grid(score, cell=16, max_kp=64)
        xy, valid = np.asarray(xy), np.asarray(valid)
        assert valid.sum() > 20
        # At most one keypoint per 16x16 cell
        cells = set()
        for (x, y) in xy[valid]:
            c = (int(y) // 16, int(x) // 16)
            assert c not in cells
            cells.add(c)


class TestBrief:
    def test_orientation_rotates_with_image(self):
        # A gradient patch rotated 90 deg should rotate the angle by ~90 deg.
        img = np.tile(np.linspace(0, 255, 64, dtype=np.float32), (64, 1))
        xy = jnp.asarray([[32.0, 32.0]])
        a0 = float(brief.compute_orientation(jnp.asarray(img), xy)[0])
        a90 = float(brief.compute_orientation(jnp.asarray(np.rot90(img).copy()), xy)[0])
        diff = (a90 - a0) % (2 * np.pi)
        assert min(abs(diff - np.pi / 2), abs(diff - 3 * np.pi / 2)) < 0.1

    def test_descriptor_stability_under_shift(self):
        # Descriptors at the same physical point in a shifted image match.
        tex = synthetic.random_texture(256, 256, seed=2)
        img1 = jnp.asarray(tex[:192, :192])
        img2 = jnp.asarray(tex[8:200, 4:196])  # shift by (8, 4)
        pts1 = jnp.asarray(np.random.default_rng(0).uniform(40, 150, (32, 2)).astype(np.float32))
        pts2 = pts1 - jnp.asarray([4.0, 8.0])  # (x, y) offsets
        b1 = pyramid.gaussian_blur(img1)
        b2 = pyramid.gaussian_blur(img2)
        a1 = brief.compute_orientation(img1, pts1)
        a2 = brief.compute_orientation(img2, pts2)
        d1 = brief.compute_brief(b1, pts1, a1)
        d2 = brief.compute_brief(b2, pts2, a2)
        dist = np.asarray(descriptors.hamming_pairwise(d1, d2))
        assert np.median(dist) < 40  # same points: small Hamming distance
        # vs random pairing: large distance
        d_rand = np.asarray(descriptors.hamming_pairwise(d1, jnp.roll(d2, 1, axis=0)))
        assert np.median(d_rand) > 80


class TestFullExtract:
    @pytest.fixture(scope="class")
    def feats(self):
        cfg = OrbConfig(n_features=512, n_levels=4, cell_size=16)
        img = jnp.asarray(synthetic.random_texture(240, 320, seed=3))
        return orb.extract(img, cfg), cfg

    def test_shapes_and_validity(self, feats):
        f, cfg = feats
        assert f.xy.shape == (512, 2)
        assert f.desc.shape == (512, 32)
        assert np.asarray(f.valid).sum() > 256  # textured image: most slots fill

    def test_coords_in_bounds(self, feats):
        f, _ = feats
        xy = np.asarray(f.xy)[np.asarray(f.valid)]
        assert (xy[:, 0] >= 0).all() and (xy[:, 0] < 320).all()
        assert (xy[:, 1] >= 0).all() and (xy[:, 1] < 240).all()

    def test_octaves_populated(self, feats):
        f, cfg = feats
        oct_ = np.asarray(f.octave)[np.asarray(f.valid)]
        assert set(np.unique(oct_)) == set(range(cfg.n_levels))

    def test_two_view_matching(self):
        """The end-goal property: two shifted views of one texture produce
        many correct mutual matches via the Hamming matcher."""
        cfg = OrbConfig(n_features=512, n_levels=4, cell_size=16)
        tex = synthetic.random_texture(320, 400, seed=4)
        img1 = jnp.asarray(tex[:256, :320])
        img2 = jnp.asarray(tex[10:266, 6:326])  # shift (dy=10, dx=6)
        f1 = orb.extract(img1, cfg)
        f2 = orb.extract(img2, cfg)
        d = descriptors.masked_hamming_matrix(
            f1.desc, f2.desc, valid_a=f1.valid, valid_b=f2.valid
        )
        idx, dist, ok = descriptors.mutual_best(d, max_dist=50, ratio=0.8)
        idx, ok = np.asarray(idx), np.asarray(ok)
        assert ok.sum() > 50
        # Matched keypoints should differ by ~(dx=-6, dy=-10) in image coords
        xy1 = np.asarray(f1.xy)[ok]
        xy2 = np.asarray(f2.xy)[idx[ok]]
        delta = xy1 - xy2
        med = np.median(delta, axis=0)
        np.testing.assert_allclose(med, [6.0, 10.0], atol=1.5)
        # Most matches agree with the global shift (inlier ratio)
        inliers = (np.abs(delta - [6, 10]) < 2).all(axis=1)
        assert inliers.mean() > 0.7
