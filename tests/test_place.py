"""Tests for bag-of-binary-words vocabulary + keyframe database."""

import jax.numpy as jnp
import numpy as np
import pytest

from corbslam_tpu.ops import descriptors as D
from corbslam_tpu.place import vocab as V
from corbslam_tpu.place import database as DB


def corrupt(rng, desc, n_bits):
    out = desc.copy()
    for i in range(out.shape[0]):
        for b in rng.integers(0, 256, n_bits):
            out[i, b // 8] ^= 1 << (b % 8)
    return out


@pytest.fixture(scope="module")
def voc():
    rng = np.random.default_rng(0)
    train_desc = rng.integers(0, 256, size=(8000, 32), dtype=np.uint8)
    return V.train(jnp.asarray(train_desc), n_words=256, n_iters=6)


class TestVocab:
    def test_transform_normalized(self, voc, rng):
        desc = rng.integers(0, 256, size=(128, 32), dtype=np.uint8)
        v = V.transform(voc, jnp.asarray(desc), jnp.ones(128, bool))
        assert v.shape == (256,)
        assert abs(float(jnp.sum(jnp.abs(v))) - 1.0) < 1e-5
        assert float(jnp.min(v)) >= 0.0

    def test_self_similarity_is_max(self, voc, rng):
        """A frame scores higher against itself (slightly corrupted) than
        against unrelated frames — the property loop detection needs."""
        base = rng.integers(0, 256, size=(200, 32), dtype=np.uint8)
        v0 = V.transform(voc, jnp.asarray(base), jnp.ones(200, bool))
        v_same = V.transform(voc, jnp.asarray(corrupt(rng, base, 8)), jnp.ones(200, bool))
        others = [
            V.transform(
                voc,
                jnp.asarray(rng.integers(0, 256, size=(200, 32), dtype=np.uint8)),
                jnp.ones(200, bool),
            )
            for _ in range(8)
        ]
        db = jnp.stack([v_same] + others)
        scores = np.asarray(V.l1_scores(v0, db))
        assert scores.argmax() == 0
        assert scores[0] > 1.5 * scores[1:].max()

    def test_invalid_features_ignored(self, voc, rng):
        desc = rng.integers(0, 256, size=(64, 32), dtype=np.uint8)
        valid = np.zeros(64, bool)
        valid[:32] = True
        v1 = V.transform(voc, jnp.asarray(desc), jnp.asarray(valid))
        v2 = V.transform(voc, jnp.asarray(desc[:32]), jnp.ones(32, bool))
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-6)

    def test_words_are_valid_bits(self, voc):
        wb = np.asarray(voc.word_bits)
        assert set(np.unique(wb)) <= {0, 1}


class TestDatabase:
    def test_reloc_candidates_find_similar(self, voc, rng):
        from corbslam_tpu.config import CapacityConfig
        from corbslam_tpu.mapstate import mapstate as ms

        cap = CapacityConfig(max_keyframes=16, max_map_points=512, max_features=64)
        m = ms.empty(cap)
        db = DB.BowDatabase.empty(16, voc.n_words)
        descs = []
        for i in range(6):
            d = rng.integers(0, 256, size=(64, 32), dtype=np.uint8)
            descs.append(d)
            v = V.transform(voc, jnp.asarray(d), jnp.ones(64, bool))
            m, row = ms.insert_keyframe(
                m, jnp.eye(4), jnp.zeros((64, 2)), jnp.zeros(64, jnp.int32),
                jnp.zeros(64), jnp.asarray(d), jnp.full(64, -1.0),
                jnp.zeros(64), jnp.ones(64, bool), jnp.full(64, -1, jnp.int32),
                i, float(i),
            )
            db = db.add(row, v)
        # Query resembling keyframe 3
        q = V.transform(voc, jnp.asarray(corrupt(rng, descs[3], 10)), jnp.ones(64, bool))
        rows, ok = DB.detect_relocalization_candidates(db, m, q, k=3)
        rows, ok = np.asarray(rows), np.asarray(ok)
        assert ok[0]
        assert rows[0] == 3
