"""Bag-of-binary-words vocabulary as batched array lookups.

Replaces DBoW2 (/root/reference/Thirdparty/DBoW2, TemplatedVocabulary.h)
with a TPU-shaped design: the vocabulary is a (levels, nodes, 8)-packed
array of binary cluster centers; descriptor-to-word assignment descends
the K-ary tree with batched Hamming argmins (one `lax.population_count`
reduction per level over all descriptors at once). Training is k-medians
over bits (majority vote medians), seeded deterministically.

BoW vectors are SPARSE (sorted word ids + L1-normalized tf-idf weights)
so vocabularies of 10^4-10^6 words cost per-image storage proportional
to the feature count, like DBoW2's map<WordId, value>. The DBoW2 L1
score s(a, b) = 1 - 0.5 * || a/|a| - b/|b| ||_1 reduces to
sum_i min(a_i, b_i) for L1-normalized vectors — computed over the
intersection of the two word sets. KeyFrameDatabase keeps a real
inverted index (word -> keyframes) with the reference's
common-word gating (KeyFrameDatabase.cc:DetectLoopCandidates).

The reference's pretrained ORBvoc (10^6 words, K=10 L=6) targets
OpenCV's BRIEF pattern; this framework trains its own vocabulary for
its own pattern (frontend.orb). Use K=10, L>=4 (10^4+ words) for
street-scale loop closure — 512-word vocabularies flood detection with
false candidates on self-similar scenes (see tests/test_vocab_scale);
L=5 (10^5 words) is the measured sweet spot at 2k-keyframe scale
(wider true/novel score margin AND faster queries, docs/vocab_scale.md).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_POP8 = np.unpackbits(
    np.arange(256, dtype=np.uint8)[:, None], axis=1
).sum(1).astype(np.uint16)


def _hamming_np(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(N, 8) x (M, 8) uint32 -> (N, M) int popcount distances, host.
    Byte-table popcount: 4x less transient memory than unpackbits."""
    x = (a[:, None, :] ^ b[None, :, :]).view(np.uint8)
    return _POP8[x].sum(-1, dtype=np.int32)


def _bit_median(descs: np.ndarray) -> np.ndarray:
    """Majority-vote binary median of (N, 8) uint32 descriptors."""
    bits = np.unpackbits(descs.view(np.uint8), axis=-1)      # (N, 256)
    med = (bits.mean(axis=0) >= 0.5).astype(np.uint8)
    return np.packbits(med).view(np.uint32)


@dataclasses.dataclass
class Vocabulary:
    branching: int
    levels: int
    centers: np.ndarray       # (n_internal_nodes_padded, 8) packed by level
    word_weights: np.ndarray  # (n_words,) idf
    # Non-complete trees (ingested DBoW2 vocabularies, place/orbvoc.py):
    # `valid` masks the complete-array slots that hold a real node (an
    # invalid slot can never win the descent argmin), and `leaf_word`
    # maps bottom-level slots to DBoW2 word ids (words are assigned in
    # file order there, and early leaves — nodes with < K children —
    # are words above the bottom level). None for self-trained
    # vocabularies, whose trees are complete by construction.
    valid: np.ndarray | None = None       # (n_nodes,) float32/bool
    leaf_word: np.ndarray | None = None   # (K**L,) int32, -1 = no word

    @property
    def n_words(self) -> int:
        return len(self.word_weights)

    # ------------------------------------------------------------------
    @staticmethod
    def train(
        descriptors: np.ndarray, branching: int = 8, levels: int = 3,
        iters: int = 8, seed: int = 0,
    ) -> "Vocabulary":
        """Hierarchical k-medians over binary descriptors."""
        rng = np.random.default_rng(seed)
        K, L = branching, levels
        n_nodes = sum(K ** (l + 1) for l in range(L))
        centers = np.zeros((n_nodes, 8), np.uint32)

        def kmedians(data):
            if len(data) == 0:
                return np.zeros((K, 8), np.uint32), [np.empty(0, np.int64)] * K
            init = data[rng.choice(len(data), min(K, len(data)), replace=False)]
            cents = np.zeros((K, 8), np.uint32)
            cents[: len(init)] = init
            for _ in range(iters):
                d = _hamming_np(data, cents)
                assign = d.argmin(axis=1)
                for k in range(K):
                    members = data[assign == k]
                    if len(members):
                        cents[k] = _bit_median(members)
            d = _hamming_np(data, cents)
            assign = d.argmin(axis=1)
            groups = [np.nonzero(assign == k)[0] for k in range(K)]
            return cents, groups

        # breadth-first training
        offset = 0
        frontier = [descriptors]
        for level in range(L):
            next_frontier = []
            for node_data in frontier:
                cents, groups = kmedians(node_data)
                centers[offset : offset + K] = cents
                offset += K
                next_frontier.extend(
                    node_data[g] if len(node_data) else node_data for g in groups
                )
            frontier = next_frontier

        voc = Vocabulary(K, L, centers, np.ones(K**L, np.float32))
        # idf weights from the training set
        words = voc.assign_words(descriptors)
        counts = np.bincount(words, minlength=voc.n_words).astype(np.float32)
        n = max(len(descriptors), 1)
        voc.word_weights = np.log(n / np.maximum(counts, 1.0)).astype(np.float32)
        return voc

    def save(self, path: str):
        extras = {}
        if self.valid is not None:
            extras["valid"] = self.valid
            extras["leaf_word"] = self.leaf_word
        np.savez_compressed(
            path, branching=self.branching, levels=self.levels,
            centers=self.centers, word_weights=self.word_weights, **extras,
        )

    @staticmethod
    def load(path: str) -> "Vocabulary":
        data = np.load(path)
        return Vocabulary(
            int(data["branching"]), int(data["levels"]),
            np.asarray(data["centers"]), np.asarray(data["word_weights"]),
            np.asarray(data["valid"]) if "valid" in data else None,
            np.asarray(data["leaf_word"]) if "leaf_word" in data else None,
        )

    @staticmethod
    def load_any(path: str) -> "Vocabulary":
        """Load a vocabulary by extension: .npz (this framework's
        trained format) or DBoW2 ORBvoc .bin/.txt (the reference's
        pretrained vocabulary, System.cc:76-87; requires
        ORBParams(pattern="reference") for matching descriptor bits)."""
        if path.endswith(".bin") or path.endswith(".txt"):
            from .orbvoc import load_orbvoc

            return load_orbvoc(path)
        return Vocabulary.load(path)

    # ------------------------------------------------------------------
    def _device_tree(self):
        """Device-resident centers/valid, cached across queries: the
        reference-scale tree is ~36 MB (10^6 words) — re-uploading it per
        keyframe query would dwarf the descent itself on a relay-attached
        TPU. Keyed on the numpy array's identity (centers never mutate
        after construction; word_weights may)."""
        cache = getattr(self, "_dev", None)
        if cache is None or cache[0] is not self.centers:
            cents = jnp.asarray(self.centers)
            val = (
                jnp.asarray(self.valid, jnp.float32)
                if self.valid is not None else None
            )
            cache = (self.centers, cents, val)
            self._dev = cache
        return cache[1], cache[2]

    def assign_words(self, descriptors: np.ndarray) -> np.ndarray:
        """(N, 8) -> (N,) word ids, batched tree descent."""
        cents, val = self._device_tree()
        if self.valid is None:
            leaves = _assign_words_jit(
                jnp.asarray(descriptors), cents,
                self.branching, self.levels,
            )
            return np.asarray(leaves)
        leaves = _assign_words_masked_jit(
            jnp.asarray(descriptors), cents, val,
            self.branching, self.levels,
        )
        return self.leaf_word[np.asarray(leaves)]

    def bow_vector(self, descriptors: np.ndarray, valid=None) -> "BowVector":
        """Sparse tf-idf BoW vector, L1-normalized."""
        words = self.assign_words(descriptors)
        if valid is not None:
            words = words[np.asarray(valid) > 0]
        uniq, counts = np.unique(words, return_counts=True)
        w = counts.astype(np.float32) * self.word_weights[uniq]
        s = w.sum()
        if s > 0:
            w /= s
        return BowVector(uniq.astype(np.int64), w)

    @staticmethod
    def score(a, b) -> float:
        """DBoW2 L1 score in [0, 1]: 1 - 0.5*||a - b||_1 =
        sum min(a_i, b_i) for L1-normalized vectors."""
        if isinstance(a, BowVector):
            common, ia, ib = np.intersect1d(
                a.words, b.words, assume_unique=True, return_indices=True
            )
            if len(common) == 0:
                return 0.0
            return float(np.minimum(a.weights[ia], b.weights[ib]).sum())
        return float(1.0 - 0.5 * np.abs(a - b).sum())


@dataclasses.dataclass
class BowVector:
    """Sparse L1-normalized tf-idf image signature."""
    words: np.ndarray     # (K,) sorted unique word ids
    weights: np.ndarray   # (K,) float32, sums to 1


@partial(jax.jit, static_argnums=(2, 3))
def _assign_words_jit(descs, centers, branching, levels):
    K = branching
    n = descs.shape[0]
    node = jnp.zeros((n,), jnp.int32)     # word index within current level
    offset = 0
    for level in range(levels):
        child_base = offset + node * K                      # (n,)
        idx = child_base[:, None] + jnp.arange(K)[None, :]  # (n, K)
        cents = centers[idx]                                # (n, K, 8)
        x = jnp.bitwise_xor(descs[:, None, :], cents)
        d = jnp.sum(jax.lax.population_count(x), axis=-1)   # (n, K)
        node = node * K + jnp.argmin(d, axis=-1).astype(jnp.int32)
        offset += K ** (level + 1)
    return node


@partial(jax.jit, static_argnums=(3, 4))
def _assign_words_masked_jit(descs, centers, valid, branching, levels):
    """Tree descent over a non-complete tree: invalid child slots take a
    +1024 distance penalty (> any 256-bit Hamming distance) so the argmin
    always lands on a real child; ties break toward the lowest slot,
    which preserves DBoW2's first-child-wins scan order (children are
    packed in file order by place/orbvoc.py)."""
    K = branching
    n = descs.shape[0]
    node = jnp.zeros((n,), jnp.int32)
    offset = 0
    for level in range(levels):
        child_base = offset + node * K
        idx = child_base[:, None] + jnp.arange(K)[None, :]
        cents = centers[idx]
        x = jnp.bitwise_xor(descs[:, None, :], cents)
        d = jnp.sum(jax.lax.population_count(x), axis=-1)
        d = d + (1024 * (1.0 - valid[idx])).astype(d.dtype)
        node = node * K + jnp.argmin(d, axis=-1).astype(jnp.int32)
        offset += K ** (level + 1)
    return node


class KeyFrameDatabase:
    """Inverted-file loop/relocalization candidate store
    (reference KeyFrameDatabase.cc): a word -> keyframes index prunes
    candidates to those sharing vocabulary with the query, then the
    reference's common-word gate (>= 0.8 * max shared words,
    KeyFrameDatabase.cc:DetectLoopCandidates) bounds the scoring set."""

    def __init__(self, voc: Vocabulary):
        self.voc = voc
        self.vectors: dict[int, BowVector] = {}
        self.inverted: dict[int, set[int]] = {}     # word -> kf ids

    def add(self, kf_id: int, bow: BowVector):
        self.vectors[kf_id] = bow
        for w in bow.words:
            self.inverted.setdefault(int(w), set()).add(kf_id)

    def erase(self, kf_id: int):
        bow = self.vectors.pop(kf_id, None)
        if bow is not None:
            for w in bow.words:
                s = self.inverted.get(int(w))
                if s is not None:
                    s.discard(kf_id)

    def query(
        self, bow: BowVector, min_score: float, exclude: set[int]
    ) -> list[tuple[int, float]]:
        """(kf_id, score) candidates above min_score, best first."""
        shared: dict[int, int] = {}
        for w in bow.words:
            for kf_id in self.inverted.get(int(w), ()):
                if kf_id not in exclude:
                    shared[kf_id] = shared.get(kf_id, 0) + 1
        if not shared:
            return []
        min_common = 0.8 * max(shared.values())
        out = []
        for kf_id, n in shared.items():
            if n < min_common:
                continue
            s = Vocabulary.score(bow, self.vectors[kf_id])
            if s >= min_score:
                out.append((kf_id, s))
        out.sort(key=lambda t: -t[1])
        return out
