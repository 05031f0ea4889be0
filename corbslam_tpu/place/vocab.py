"""Bag-of-binary-words vocabulary as dense TPU matmuls.

Replaces DBoW2's hierarchical vocabulary (ref:
corbslam_client/Thirdparty/DBoW2/DBoW2/TemplatedVocabulary.h: k=10 branch,
L=6 depth tree walked per descriptor with per-level Hamming argmin;
FORB.cpp mean/distance). The tree exists to make CPU lookup sublinear; on
the MXU a FLAT argmin over all W words is one int8 matmul
([F, 256] x [256, W] = a few GMACs), so the vocabulary here is simply:

    words:  [W, 256] int8 bit centers   (+ packed uint8 [W, 32] mirror)
    idf:    [W] f32 inverse document frequency weights

Training is k-majority (binary k-means: Hamming assignment + per-bit
majority vote centers), the same primitive DBoW2 uses per tree node
(TemplatedVocabulary::HKmeansStep), run flat over all W clusters at once.

BoW vectors are L1-normalized tf-idf histograms [W] f32; similarity is the
DBoW2 L1 score s(v, w) = 1 - 0.5*|v - w|_1 = sum_i min(v_i, w_i) for
normalized vectors (ScoringObject.cpp L1Scoring) — evaluated dense for
whole keyframe databases at once (place/database.py).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import descriptors as D


class Vocabulary(NamedTuple):
    word_bits: jnp.ndarray  # [W, 256] int8 in {0, 1}
    idf: jnp.ndarray        # [W] f32
    # Optional 2-level acceleration tree (build_tree): assignment first
    # descends to the nearest of G group centers, then argmins only that
    # group's child block — DBoW2's hierarchical descent
    # (TemplatedVocabulary.h k=10/L=6 tree), collapsed to 2 levels. On the
    # MXU the flat [F, W] argmin is nearly free, but CPU collab workers
    # and the fusion server pay ~4 GMAC per keyframe at W=32k; the tree
    # cuts that ~60x (G + Cmax vs W comparisons per feature).
    group_bits: jnp.ndarray | None = None  # [G, 256] int8
    child_idx: jnp.ndarray | None = None   # [G, Cmax] i32, -1 padded

    @property
    def n_words(self):
        return self.word_bits.shape[0]


def _assign(desc_bits: jnp.ndarray, word_bits: jnp.ndarray) -> jnp.ndarray:
    """[N, 256] x [W, 256] -> nearest word id [N] by Hamming distance."""
    d = D.hamming_matrix_bits(desc_bits, word_bits)
    return jnp.argmin(d, axis=1)


@partial(jax.jit, static_argnames=("n_words", "n_iters"))
def _kmajority(desc_bits: jnp.ndarray, init_words: jnp.ndarray, n_words: int, n_iters: int):
    """Binary k-means: Hamming assignment + majority-vote centers."""

    def step(words, _):
        assign = _assign(desc_bits, words)
        ones = jax.ops.segment_sum(
            desc_bits.astype(jnp.int32), assign, n_words
        )  # [W, 256] count of 1-bits
        counts = jax.ops.segment_sum(
            jnp.ones(desc_bits.shape[0], jnp.int32), assign, n_words
        )
        maj = (2 * ones > counts[:, None]).astype(jnp.int8)
        # Empty clusters keep their previous center.
        words = jnp.where((counts > 0)[:, None], maj, words)
        return words, counts

    words, counts = jax.lax.scan(step, init_words, None, length=n_iters)
    return words, counts


def train(
    descriptors: jnp.ndarray,  # [N, 32] uint8 packed
    n_words: int = 4096,
    n_iters: int = 10,
    seed: int = 0,
) -> Vocabulary:
    """Train a flat W-word vocabulary from packed descriptors.

    Equivalent capability to DBoW2 vocabulary creation
    (TemplatedVocabulary::create); idf from the training corpus
    (idf_i = log(N / n_docs_with_word_i) approximated per descriptor)."""
    bits = D.unpack_bits(descriptors)
    n = bits.shape[0]
    key = jax.random.PRNGKey(seed)
    init_idx = jax.random.choice(key, n, (n_words,), replace=n < n_words)
    init = bits[init_idx]
    words, counts = _kmajority(bits, init, n_words, n_iters)
    freq = counts[-1] if counts.ndim > 1 else counts
    n_total = jnp.maximum(jnp.sum(freq), 1)
    idf = jnp.log(n_total.astype(jnp.float32) / jnp.maximum(freq.astype(jnp.float32), 1.0))
    return Vocabulary(word_bits=words, idf=idf)


def save(voc: Vocabulary, path: str) -> None:
    """Persist a trained vocabulary (the reusable-artifact equivalent of
    the reference's ORBvoc.txt, TemplatedVocabulary.h:1338 loadFromTextFile
    — npz of packed bit centers + idf instead of a 140 MB text tree)."""
    import numpy as np

    extra = {}
    if voc.group_bits is not None:
        extra["group_bits_packed"] = np.packbits(
            np.asarray(voc.group_bits, np.uint8), axis=1)
        extra["child_idx"] = np.asarray(voc.child_idx, np.int32)
    np.savez_compressed(
        path,
        word_bits_packed=np.packbits(
            np.asarray(voc.word_bits, np.uint8), axis=1
        ),
        idf=np.asarray(voc.idf, np.float32),
        **extra,
    )


def load(path: str) -> Vocabulary:
    import numpy as np

    z = np.load(path)
    bits = np.unpackbits(z["word_bits_packed"], axis=1)[:, :256]
    voc = Vocabulary(
        word_bits=jnp.asarray(bits, jnp.int8),
        idf=jnp.asarray(z["idf"], jnp.float32),
    )
    if "group_bits_packed" in z:
        gb = np.unpackbits(z["group_bits_packed"], axis=1)[:, :256]
        voc = voc._replace(
            group_bits=jnp.asarray(gb, jnp.int8),
            child_idx=jnp.asarray(z["child_idx"], jnp.int32),
        )
    return voc


def default_artifact_path() -> str:
    """Repo-shipped universal vocabulary (assets/vocab32k.npz) — the
    equivalent of the reference's Vocabulary/ORBvoc.txt argv path."""
    import os

    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), "assets", "vocab32k.npz")


def load_default() -> "Vocabulary | None":
    """Load the shipped artifact if present; None otherwise (callers then
    fall back to inline bootstrap training for hermetic runs)."""
    import os

    p = default_artifact_path()
    return load_any(p) if os.path.exists(p) else None


def load_any(path: str) -> Vocabulary:
    """Load either the packed artifact format (save()) or a raw
    word_bits/idf npz (ad-hoc dumps from older runners)."""
    import numpy as np

    z = np.load(path)
    if "word_bits_packed" in z:
        return load(path)
    return Vocabulary(
        word_bits=jnp.asarray(z["word_bits"]),
        idf=jnp.asarray(z["idf"], jnp.float32),
    )


def train_chunked(
    descriptors,  # [N, 32] uint8 packed (numpy ok)
    n_words: int = 32768,
    n_iters: int = 8,
    seed: int = 0,
    chunk: int = 65536,
) -> Vocabulary:
    """k-majority over a corpus too large for one resident [N, W] distance
    matrix: per-iteration streaming over descriptor chunks, accumulating
    per-word bit counts with segment_sum. Exact same fixed-point as
    `train` (assignment is still a flat argmin over ALL words — the MXU
    eats the [chunk, 256] x [256, W] matmul), just blocked over N."""
    import numpy as np

    desc = np.asarray(descriptors)
    n = desc.shape[0]
    pad = (-n) % chunk
    if pad:
        desc = np.concatenate([desc, np.zeros((pad, 32), np.uint8)], 0)
    weight_np = np.concatenate(
        [np.ones(n, np.float32), np.zeros(pad, np.float32)]
    )
    bits_all = D.unpack_bits(jnp.asarray(desc))
    key = jax.random.PRNGKey(seed)
    init_idx = jax.random.choice(key, n, (n_words,), replace=n < n_words)
    words = bits_all[init_idx]

    @partial(jax.jit, donate_argnums=(1, 2))
    def accum(words, ones, counts, bits_c, w_c):
        a = _assign(bits_c, words)
        ones = ones + jax.ops.segment_sum(
            bits_c.astype(jnp.int32) * w_c[:, None].astype(jnp.int32),
            a, n_words)
        counts = counts + jax.ops.segment_sum(
            w_c.astype(jnp.int32), a, n_words)
        return ones, counts

    n_chunks = bits_all.shape[0] // chunk
    bits_chunks = bits_all.reshape(n_chunks, chunk, 256)
    w_chunks = jnp.asarray(weight_np).reshape(n_chunks, chunk)
    counts = None
    for _ in range(n_iters):
        ones = jnp.zeros((n_words, 256), jnp.int32)
        counts = jnp.zeros((n_words,), jnp.int32)
        for c in range(n_chunks):
            ones, counts = accum(words, ones, counts, bits_chunks[c], w_chunks[c])
        maj = (2 * ones > counts[:, None]).astype(jnp.int8)
        words = jnp.where((counts > 0)[:, None], maj, words)
    n_total = jnp.maximum(jnp.sum(counts), 1)
    idf = jnp.log(
        n_total.astype(jnp.float32) / jnp.maximum(counts.astype(jnp.float32), 1.0)
    )
    return Vocabulary(word_bits=words, idf=idf)


def train_hierarchical(
    descriptors,  # [N, 32] uint8 packed (numpy ok)
    n_groups: int = 1024,
    words_per_group: int = 32,
    n_iters: int = 8,
    seed: int = 0,
    chunk: int = 16384,
) -> Vocabulary:
    """Train a 2-level HIERARCHICAL vocabulary — the reference's actual
    DBoW2 construction (TemplatedVocabulary::create / HKmeansStep: k-means
    the corpus per node, recurse into each cluster's descriptors), at
    branch factors (G=1024, B=32) sized for one matmul per level.

    Why not a flat vocabulary + post-hoc tree: greedy descent over a
    post-hoc bucketing of flat words misassigns boundary descriptors (41%
    agreement with exact assignment, held-out recall@1 0.86 -> 0.64,
    tools/vocab_tree_diag.py) because flat word clusters don't nest inside
    the group partition. Training words INSIDE each group's corpus
    partition makes descent self-consistent: a query descriptor near a
    database descriptor descends to the same group (both were quantized by
    the same top level) and the word argmin then runs over the exact block
    its word was trained in. Assignment cost is G + B distances per
    descriptor (30x under flat at W=32k) on clients, server and workers
    alike.

    W = n_groups * words_per_group. Returns a Vocabulary whose
    group_bits/child_idx encode the training-time hierarchy (child block g
    is exactly words [g*B, (g+1)*B))."""
    import numpy as np

    G, B = n_groups, words_per_group
    W = G * B
    desc = np.asarray(descriptors)
    n = desc.shape[0]
    pad = (-n) % chunk
    if pad:
        desc = np.concatenate([desc, np.zeros((pad, 32), np.uint8)], 0)
    weight_np = np.concatenate(
        [np.ones(n, np.float32), np.zeros(pad, np.float32)])
    bits_all = D.unpack_bits(jnp.asarray(desc))
    n_chunks = bits_all.shape[0] // chunk
    bits_chunks = bits_all.reshape(n_chunks, chunk, 256)
    w_chunks = jnp.asarray(weight_np).reshape(n_chunks, chunk)

    # ---- level 1: G group centers over the whole corpus ----------------
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    init_idx = jax.random.choice(k1, n, (G,), replace=n < G)
    gb = bits_all[init_idx]

    @partial(jax.jit, donate_argnums=(1, 2))
    def accum_l1(words, ones, counts, bits_c, w_c):
        a = _assign(bits_c, words)
        ones = ones + jax.ops.segment_sum(
            bits_c.astype(jnp.int32) * w_c[:, None].astype(jnp.int32), a, G)
        counts = counts + jax.ops.segment_sum(w_c.astype(jnp.int32), a, G)
        return ones, counts

    for _ in range(n_iters):
        ones = jnp.zeros((G, 256), jnp.int32)
        counts = jnp.zeros((G,), jnp.int32)
        for c in range(n_chunks):
            ones, counts = accum_l1(gb, ones, counts,
                                    bits_chunks[c], w_chunks[c])
        maj = (2 * ones > counts[:, None]).astype(jnp.int8)
        gb = jnp.where((counts > 0)[:, None], maj, gb)

    # ---- level 2: B words inside each group's corpus partition ---------
    grp = np.empty(bits_all.shape[0], np.int32)
    for c in range(n_chunks):
        grp[c * chunk:(c + 1) * chunk] = np.asarray(_assign(bits_chunks[c], gb))
    # Init: B member descriptors per group (host-side sampling; thin or
    # empty groups recycle members / fall back to the group center).
    rng = np.random.default_rng(seed + 7)
    gb_np = np.asarray(gb, np.int8)
    init_words = np.repeat(gb_np[:, None, :], B, axis=1).copy()  # [G, B, 256]
    w_real = weight_np > 0
    for g in range(G):
        members = np.nonzero((grp == g) & w_real)[0]
        if len(members):
            pick = rng.choice(members, B, replace=len(members) < B)
            init_words[g] = np.asarray(bits_all[jnp.asarray(pick)], np.int8)
    words = jnp.asarray(init_words.reshape(W, 256))
    grp_chunks = jnp.asarray(grp).reshape(n_chunks, chunk)

    @partial(jax.jit, donate_argnums=(1, 2))
    def accum_l2(words, ones, counts, bits_c, w_c, g_c):
        blocks = words.reshape(G, B, 256)[g_c]              # [chunk, B, 256]
        pa = jnp.sum(bits_c.astype(jnp.int32), axis=-1)
        pb = jnp.sum(blocks.astype(jnp.int32), axis=-1)     # [chunk, B]
        dot = jax.lax.dot_general(
            bits_c, blocks,
            dimension_numbers=(((1,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        )
        j = jnp.argmin(pa[:, None] + pb - 2 * dot, axis=1)  # [chunk]
        a = g_c * B + j.astype(jnp.int32)                   # global word id
        ones = ones + jax.ops.segment_sum(
            bits_c.astype(jnp.int32) * w_c[:, None].astype(jnp.int32), a, W)
        counts = counts + jax.ops.segment_sum(w_c.astype(jnp.int32), a, W)
        return ones, counts

    counts = jnp.zeros((W,), jnp.int32)
    for _ in range(n_iters):
        ones = jnp.zeros((W, 256), jnp.int32)
        counts = jnp.zeros((W,), jnp.int32)
        for c in range(n_chunks):
            ones, counts = accum_l2(words, ones, counts, bits_chunks[c],
                                    w_chunks[c], grp_chunks[c])
        maj = (2 * ones > counts[:, None]).astype(jnp.int8)
        words = jnp.where((counts > 0)[:, None], maj, words)

    n_total = jnp.maximum(jnp.sum(counts), 1)
    idf = jnp.log(n_total.astype(jnp.float32) /
                  jnp.maximum(counts.astype(jnp.float32), 1.0))
    child = jnp.arange(W, dtype=jnp.int32).reshape(G, B)
    return Vocabulary(word_bits=words, idf=idf, group_bits=gb,
                      child_idx=child)


def build_tree(voc: Vocabulary, n_groups: int = 1024, n_iters: int = 8,
               seed: int = 0, dup: int = 4) -> Vocabulary:
    """Attach a 2-level descent tree to a flat vocabulary: k-majority
    cluster the WORD centers into `n_groups` groups, then store each word
    in the buckets of its `dup` NEAREST groups (fixed-shape child blocks).

    Duplication is the accuracy lever: a post-hoc tree over an
    already-trained flat vocabulary puts many descriptors nearer a word
    whose bucket the greedy descent never opens (single-bucket placement
    measured 41% word agreement with exact flat assignment and cost
    held-out recall@1 0.86 -> 0.64, tools/vocab_tree_diag.py). Widening
    the QUERY side (top_g descent) recovers agreement but multiplies query
    cost; widening the STORAGE side instead puts each word where nearby
    queries land, so a narrow top_g descent finds it — the multi-probe
    trade LSH tables make. Capacity is sized at 2x the duplicated load so
    placement virtually never spills away from a word's nearest groups."""
    import numpy as np

    W = voc.n_words
    G = min(n_groups, W)
    dup = min(dup, G)
    key = jax.random.PRNGKey(seed + 101)
    init = voc.word_bits[jax.random.choice(key, W, (G,), replace=G > W)]
    gb, _ = _kmajority(voc.word_bits, init, G, n_iters)
    d = np.asarray(D.hamming_matrix_bits(voc.word_bits, gb))  # [W, G]
    order = np.argsort(d, axis=1)
    cmax = max(8, int(np.ceil(2 * dup * W / G)))
    buckets: list = [[] for _ in range(G)]
    # Rank-major placement: every word claims its rank-0 group before any
    # word claims a rank-1 slot, so capacity contention degrades the
    # OUTER probes first (exactly the slots that matter least).
    placed = [set() for _ in range(W)]
    for r in range(dup):
        for wi in range(W):
            for gi in order[wi, r:]:
                if gi in placed[wi]:
                    continue
                if len(buckets[gi]) < cmax:
                    buckets[gi].append(wi)
                    placed[wi].add(gi)
                    break
    child = np.full((G, cmax), -1, np.int32)
    for gi, b in enumerate(buckets):
        child[gi, : len(b)] = b
    return voc._replace(group_bits=gb, child_idx=jnp.asarray(child))


TREE_TOP_G = 2


def _assign_tree(bits: jnp.ndarray, voc: Vocabulary,
                 top_g: int = TREE_TOP_G) -> jnp.ndarray:
    """Two-level descent: the `top_g` nearest groups, then argmin over the
    union of their child blocks. Both stages are Hamming-via-matmul
    (d = pa + pb - 2 a.b), the same MXU/BLAS-friendly lowering as the flat
    assignment.

    Greedy single-group descent (DBoW2's TemplatedVocabulary.h per-level
    argmin) is too lossy for a POST-HOC tree: its nodes are true
    hierarchical k-means clusters, ours bucket an already-trained flat
    vocabulary, so boundary descriptors routinely sit nearer a word in the
    second-best group (measured: 41% word agreement with flat assignment,
    held-out recall@1 0.86 -> 0.64, tools/vocab_tree_diag.py). Descending
    the best `top_g` groups recovers flat-assignment quality while still
    scanning only top_g*Cmax of W words (1/16th at W=32k defaults). The
    scan carries (best distance, best word) so peak memory stays one
    [F, Cmax, 256] child-block gather regardless of top_g."""
    dg = D.hamming_matrix_bits(bits, voc.group_bits)       # [F, G]
    k = min(top_g, voc.group_bits.shape[0])
    _, gsel = jax.lax.top_k(-dg, k)                        # [F, k]
    pa = jnp.sum(bits.astype(jnp.int32), axis=-1)          # [F]

    def one_group(carry, g):
        best_d, best_w = carry
        kids = voc.child_idx[g]                            # [F, Cmax]
        kb = voc.word_bits[jnp.clip(kids, 0)]              # [F, Cmax, 256]
        pb = jnp.sum(kb.astype(jnp.int32), axis=-1)        # [F, Cmax]
        dot = jax.lax.dot_general(
            bits, kb,
            dimension_numbers=(((1,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        )                                                  # [F, Cmax]
        d = pa[:, None] + pb - 2 * dot
        d = jnp.where(kids >= 0, d, 1 << 20)
        j = jnp.argmin(d, axis=1)
        dmin = jnp.take_along_axis(d, j[:, None], axis=1)[:, 0]
        wmin = jnp.take_along_axis(kids, j[:, None], axis=1)[:, 0]
        upd = dmin < best_d
        return (jnp.where(upd, dmin, best_d),
                jnp.where(upd, wmin, best_w)), None

    F = bits.shape[0]
    init = (jnp.full(F, 1 << 20, jnp.int32), jnp.zeros(F, jnp.int32))
    (best_d, best_w), _ = jax.lax.scan(one_group, init, gsel.T)
    return best_w


@jax.jit
def transform(
    voc: Vocabulary,
    desc: jnp.ndarray,   # [F, 32] packed
    valid: jnp.ndarray,  # [F]
) -> jnp.ndarray:
    """Descriptors -> L1-normalized tf-idf BoW vector [W] f32.

    The reference's `Frame::ComputeBoW` / `KeyFrame::ComputeBoW`
    (Frame.cc:~390, KeyFrame.cc:71) without the FeatureVector side table —
    direct-index candidate pruning is unnecessary under dense matching.
    Uses the 2-level descent tree when the vocabulary carries one."""
    bits = D.unpack_bits(desc)
    if voc.child_idx is not None:
        w = _assign_tree(bits, voc)
    else:
        w = _assign(bits, voc.word_bits)
    hist = jax.ops.segment_sum(
        valid.astype(jnp.float32), w, voc.n_words
    )
    v = hist * voc.idf
    return v / jnp.maximum(jnp.sum(jnp.abs(v)), 1e-9)


@jax.jit
def transform_sparse(voc: Vocabulary, desc: jnp.ndarray, valid: jnp.ndarray):
    """BoW in sparse wire form: (word_ids [F] i32, weights [F] f32), padded
    with id -1. At most F distinct words fire per keyframe, so shipping
    (ids, weights) costs ~8 bytes/feature vs 4*W dense — this rides the
    keyframe uplink so receivers (server, every peer client) never pay the
    vocabulary transform again (VERDICT r4 #4 worker-cost item)."""
    bits = D.unpack_bits(desc)
    if voc.child_idx is not None:
        w = _assign_tree(bits, voc)
    else:
        w = _assign(bits, voc.word_bits)
    F = desc.shape[0]
    w = jnp.where(valid, w, voc.n_words)
    # Collapse duplicates: sort by word, keep first of each run with the
    # run's count.
    sw = jnp.sort(w)
    first = jnp.concatenate([jnp.ones(1, bool), sw[1:] != sw[:-1]])
    counts = jax.ops.segment_sum(jnp.ones(F, jnp.float32), sw, voc.n_words + 1)
    ids = jnp.where(first & (sw < voc.n_words), sw, -1)
    vals = jnp.where(ids >= 0, counts[jnp.clip(sw, 0, voc.n_words)], 0.0)
    vals = vals * jnp.where(ids >= 0, voc.idf[jnp.clip(ids, 0)], 0.0)
    norm = jnp.maximum(jnp.sum(jnp.abs(vals)), 1e-9)
    return ids, vals / norm


def densify_bow(n_words: int, ids: jnp.ndarray, vals: jnp.ndarray) -> jnp.ndarray:
    """Inverse of transform_sparse: scatter (ids, weights) into a dense
    [W] BoW vector (already L1-normalized at the origin)."""
    v = jnp.zeros(n_words, jnp.float32)
    return v.at[jnp.clip(ids, 0)].add(jnp.where(ids >= 0, vals, 0.0))


transform_batch = jax.vmap(transform, in_axes=(None, 0, 0))


def transform_many(voc: Vocabulary, desc: jnp.ndarray, valid: jnp.ndarray):
    """[B, F, 32] -> [B, W] BoW vectors with bounded memory: sequential
    lax.map over frames instead of one vmapped [B, F, W] distance tensor —
    required at DBoW2-scale vocabularies (W = 32k words x B frames of F
    features OOMs HBM under transform_batch; the tree the reference uses
    exists to bound this same product on CPU, TemplatedVocabulary.h)."""
    return jax.lax.map(lambda dv: transform(voc, dv[0], dv[1]), (desc, valid))


def l1_scores(query: jnp.ndarray, db: jnp.ndarray) -> jnp.ndarray:
    """DBoW2 L1 similarity of one query [W] against a database [N, W]:
    s = sum_i min(q_i, d_i) in [0, 1] for L1-normalized non-negative v."""
    return jnp.sum(jnp.minimum(query[None, :], db), axis=1)


@jax.jit
def l1_scores_batch(queries: jnp.ndarray, db: jnp.ndarray) -> jnp.ndarray:
    """[Q, W] x [N, W] -> [Q, N] L1 similarities in one program (the fused
    min-reduce; the server fusion path scores a whole sub-map per dispatch
    instead of one keyframe at a time, MapFusion.cpp:488-521)."""
    return jnp.sum(
        jnp.minimum(queries[:, None, :], db[None, :, :]), axis=-1
    )
