"""Bag-of-binary-words vocabulary as batched array lookups.

Replaces DBoW2 (/root/reference/Thirdparty/DBoW2, TemplatedVocabulary.h)
with a TPU-shaped design: the vocabulary is a (levels, nodes, 8)-packed
array of binary cluster centers; descriptor-to-word assignment descends
the K-ary tree with batched Hamming argmins (one `lax.population_count`
reduction per level over all descriptors at once). Training is k-medians
over bits (majority vote medians), seeded deterministically.

BoW vectors are dense (n_words,) tf-idf arrays; similarity is the DBoW2
L1 score s(a, b) = 1 - 0.5 * || a/|a| - b/|b| ||_1. The inverted index
of KeyFrameDatabase becomes a dense (n_kf, n_words) score problem only
at query time (candidate sets are small).

The reference's pretrained ORBvoc targets OpenCV's BRIEF pattern; this
framework trains its own vocabulary for its own pattern (frontend.orb),
so no binary-file compatibility is needed — `train` runs in seconds on
a few thousand descriptors.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _hamming_np(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(N, 8) x (M, 8) uint32 -> (N, M) int popcount distances, host."""
    x = a[:, None, :] ^ b[None, :, :]
    return np.unpackbits(x.view(np.uint8), axis=-1).sum(-1)


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

    @property
    def n_words(self) -> int:
        return self.branching**self.levels

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
        np.savez_compressed(
            path, branching=self.branching, levels=self.levels,
            centers=self.centers, word_weights=self.word_weights,
        )

    @staticmethod
    def load(path: str) -> "Vocabulary":
        data = np.load(path)
        return Vocabulary(
            int(data["branching"]), int(data["levels"]),
            np.asarray(data["centers"]), np.asarray(data["word_weights"]),
        )

    # ------------------------------------------------------------------
    def assign_words(self, descriptors: np.ndarray) -> np.ndarray:
        """(N, 8) -> (N,) word ids, batched tree descent."""
        return np.asarray(
            _assign_words_jit(
                jnp.asarray(descriptors), jnp.asarray(self.centers),
                self.branching, self.levels,
            )
        )

    def bow_vector(self, descriptors: np.ndarray, valid=None) -> np.ndarray:
        """tf-idf BoW vector (n_words,), L1-normalized."""
        words = self.assign_words(descriptors)
        if valid is not None:
            words = words[np.asarray(valid) > 0]
        v = np.bincount(words, minlength=self.n_words).astype(np.float32)
        v *= self.word_weights
        s = v.sum()
        return v / s if s > 0 else v

    @staticmethod
    def score(a: np.ndarray, b: np.ndarray) -> float:
        """DBoW2 L1 score in [0, 1]."""
        return float(1.0 - 0.5 * np.abs(a - b).sum())


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


class KeyFrameDatabase:
    """Inverted-file loop/relocalization candidate store
    (reference KeyFrameDatabase.cc)."""

    def __init__(self, voc: Vocabulary):
        self.voc = voc
        self.vectors: dict[int, np.ndarray] = {}   # kf_id -> bow vector

    def add(self, kf_id: int, bow: np.ndarray):
        self.vectors[kf_id] = bow

    def erase(self, kf_id: int):
        self.vectors.pop(kf_id, None)

    def query(
        self, bow: np.ndarray, min_score: float, exclude: set[int]
    ) -> list[tuple[int, float]]:
        """(kf_id, score) candidates above min_score, best first."""
        out = []
        for kf_id, v in self.vectors.items():
            if kf_id in exclude:
                continue
            s = Vocabulary.score(bow, v)
            if s >= min_score:
                out.append((kf_id, s))
        out.sort(key=lambda t: -t[1])
        return out
