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


class TestVocabToolchain:
    """Offline-train/save/load path (apps/train_vocab.py; the reusable
    ORBvoc-equivalent artifact, TemplatedVocabulary.h:1338)."""

    def test_save_load_roundtrip(self, voc, tmp_path):
        p = str(tmp_path / "voc.npz")
        V.save(voc, p)
        voc2 = V.load(p)
        np.testing.assert_array_equal(
            np.asarray(voc.word_bits), np.asarray(voc2.word_bits))
        np.testing.assert_allclose(
            np.asarray(voc.idf), np.asarray(voc2.idf), rtol=1e-6)

    def test_train_chunked_matches_train_quality(self, rng):
        """Chunked streaming trainer converges to a vocabulary of the same
        retrieval quality as the resident trainer on held-out views."""
        centers = rng.integers(0, 256, size=(32, 32), dtype=np.uint8)
        corpus = np.repeat(centers, 64, 0)
        corpus = corrupt(rng, corpus, 4)
        voc_c = V.train_chunked(corpus, n_words=64, n_iters=6, chunk=512)
        assert voc_c.word_bits.shape == (64, 256)
        # Held-out retrieval: same-scene frames (corrupted copies) must beat
        # unrelated frames for BOTH trainers.
        base = np.repeat(centers[:8], 25, 0)
        q = V.transform(voc_c, jnp.asarray(corrupt(rng, base, 6)),
                        jnp.ones(200, bool))
        same = V.transform(voc_c, jnp.asarray(corrupt(rng, base, 6)),
                           jnp.ones(200, bool))
        diff = [V.transform(
            voc_c,
            jnp.asarray(rng.integers(0, 256, size=(200, 32), dtype=np.uint8)),
            jnp.ones(200, bool)) for _ in range(6)]
        scores = np.asarray(V.l1_scores(q, jnp.stack([same] + diff)))
        assert scores.argmax() == 0

    def test_retrieval_precision_held_out(self, rng):
        """Scene-retrieval precision@1 on held-out views: frames of the
        same 'place' (shared descriptor pool) must retrieve each other."""
        n_places = 10
        pools = [rng.integers(0, 256, size=(300, 32), dtype=np.uint8)
                 for _ in range(n_places)]
        train = np.concatenate([p[:200] for p in pools], 0)
        voc = V.train(jnp.asarray(train), n_words=256, n_iters=6)

        def view(pool):
            idx = rng.permutation(300)[:150]
            return V.transform(voc, jnp.asarray(corrupt(rng, pool[idx], 6)),
                               jnp.ones(150, bool))

        db = jnp.stack([view(p) for p in pools])
        hits = 0
        for i in range(n_places):
            s = np.asarray(V.l1_scores(view(pools[i]), db))
            hits += int(s.argmax() == i)
        assert hits >= 9, f"precision@1 {hits}/10"
