"""DBoW2 ORBvoc ingestion: pretrained vocabulary files -> array tree.

The reference boots from a pretrained 10^6-word ORB vocabulary
(/root/reference/src/System.cc:76-87: `loadFromBinaryFile` for .bin,
`loadFromTextFile` otherwise) trained on OpenCV's learned BRIEF pattern
(use frontend.orb.ORBParams(pattern="reference") for matching bits).
This module parses both on-disk formats of the modified DBoW2
(/root/reference/Thirdparty/DBoW2/DBoW2/TemplatedVocabulary.h:1351-1545)
and lays the (possibly non-complete) tree out in the complete-K-ary
array form that `place.vocabulary.Vocabulary` descends with batched
Hamming argmins:

* text format: header line "K L scoring weighting", then one line per
  node (ids implicit, 1-based, root omitted):
  `parent is_leaf b0..b31 weight` — 32 descriptor bytes, float weight;
* binary format: header `u32 nb_nodes, u32 size_node, i32 k, i32 L,
  i32 scoring, i32 weighting`, then nb_nodes packed 41-byte records
  `i32 parent, u8 desc[32], f32 weight, u8 is_leaf`;
* word ids follow DBoW2's convention (leaves numbered in file order;
  leaves may sit above the bottom level when a cluster had < K
  descriptors) via the Vocabulary.leaf_word indirection. Early leaves
  are extended to the bottom level through a chain of self-copy
  children so the masked descent terminates on the right word.

Descriptor bytes are packed little-endian into (8,) uint32 rows — the
same layout frontend.orb._pack_brief_bits produces, so Hamming
distances against extracted descriptors are exact.
"""

from __future__ import annotations

import numpy as np

from .vocabulary import Vocabulary


def _build_array_tree(
    K: int, L: int, parents: np.ndarray, is_leaf: np.ndarray,
    desc_u32: np.ndarray, weights: np.ndarray,
) -> Vocabulary:
    """Lay out DBoW2 nodes (1-based ids, root=0 omitted) in the
    complete-tree array form with validity masks."""
    n_nodes_file = len(parents)
    # children in file order (DBoW2 pushes back as it reads — the scan
    # order its transform() uses, which argmin tie-breaking must match)
    order = np.argsort(parents, kind="stable")
    # word ids in file order of the leaves (TemplatedVocabulary.h:1421)
    word_of_node = np.full(n_nodes_file + 1, -1, np.int64)
    word_of_node[1:][is_leaf > 0] = np.arange(int(is_leaf.sum()))

    total = sum(K ** (l + 1) for l in range(L))
    centers = np.zeros((total, 8), np.uint32)
    valid = np.zeros(total, np.float32)
    leaf_word = np.full(K**L, -1, np.int32)
    level_offset = np.concatenate(
        [[0], np.cumsum([K ** (l + 1) for l in range(L)])]
    )

    # BFS: slot of node within its level; root is virtual slot 0 @ level -1
    slot = np.full(n_nodes_file + 1, -1, np.int64)
    level_of = np.full(n_nodes_file + 1, -1, np.int64)
    slot[0] = 0
    level_of[0] = -1
    child_rank: dict[int, int] = {}
    for nid in order + 1:           # node ids are 1-based; order indexes rows
        pid = int(parents[nid - 1])
        rank = child_rank.get(pid, 0)
        child_rank[pid] = rank + 1
        if rank >= K:
            raise ValueError(f"node {pid} has more than K={K} children")
        lvl = level_of[pid] + 1
        if lvl >= L:
            raise ValueError(f"tree deeper than L={L}")
        s = slot[pid] * K + rank
        level_of[nid] = lvl
        slot[nid] = s
        row = level_offset[lvl] + s
        centers[row] = desc_u32[nid - 1]
        valid[row] = 1.0
        if is_leaf[nid - 1]:
            # extend early leaves to the bottom level via self-copies
            ss = s
            for deeper in range(lvl + 1, L):
                ss = ss * K
                rr = level_offset[deeper] + ss
                centers[rr] = desc_u32[nid - 1]
                valid[rr] = 1.0
            leaf_word[ss] = word_of_node[nid]

    n_words = int(is_leaf.sum())
    word_weights = np.zeros(n_words, np.float32)
    leaf_rows = np.nonzero(is_leaf)[0]
    word_weights[word_of_node[leaf_rows + 1]] = weights[leaf_rows]
    return Vocabulary(
        K, L, centers, word_weights, valid=valid, leaf_word=leaf_word
    )


def _bytes_to_u32(desc_bytes: np.ndarray) -> np.ndarray:
    """(N, 32) uint8 -> (N, 8) uint32, little-endian (orb.py packing)."""
    return (
        np.ascontiguousarray(desc_bytes.astype(np.uint8))
        .view("<u4")
        .reshape(-1, 8)
    )


def load_orbvoc_text(path: str) -> Vocabulary:
    """Parse a DBoW2 saveToTextFile vocabulary (e.g. ORBvoc.txt)."""
    with open(path) as f:
        header = f.readline().split()
        K, L = int(header[0]), int(header[1])
        body = np.loadtxt(f, dtype=np.float64, ndmin=2)
    if body.shape[1] != 35:
        raise ValueError(
            f"expected 35 columns (parent is_leaf 32-bytes weight), "
            f"got {body.shape[1]}"
        )
    parents = body[:, 0].astype(np.int64)
    is_leaf = body[:, 1].astype(np.int64)
    desc_u32 = _bytes_to_u32(body[:, 2:34])
    weights = body[:, 34].astype(np.float32)
    return _build_array_tree(K, L, parents, is_leaf, desc_u32, weights)


_BIN_NODE = np.dtype(
    [("parent", "<i4"), ("desc", "u1", 32), ("weight", "<f4"),
     ("is_leaf", "u1")]
)


def load_orbvoc_binary(path: str) -> Vocabulary:
    """Parse a DBoW2 saveToBinaryFile vocabulary (e.g. ORBvoc.bin)."""
    with open(path, "rb") as f:
        head = f.read(24)
        nb_nodes = int(np.frombuffer(head[0:4], "<u4")[0])
        size_node = int(np.frombuffer(head[4:8], "<u4")[0])
        K = int(np.frombuffer(head[8:12], "<i4")[0])
        L = int(np.frombuffer(head[12:16], "<i4")[0])
        if size_node != _BIN_NODE.itemsize:
            raise ValueError(f"unexpected node record size {size_node}")
        recs = np.frombuffer(f.read(nb_nodes * size_node), dtype=_BIN_NODE)
    return _build_array_tree(
        K, L,
        recs["parent"].astype(np.int64),
        recs["is_leaf"].astype(np.int64),
        _bytes_to_u32(recs["desc"]),
        recs["weight"].astype(np.float32),
    )


def load_orbvoc(path: str) -> Vocabulary:
    """Load ORBvoc.bin or ORBvoc.txt by extension (System.cc:76-87)."""
    if path.endswith(".bin"):
        return load_orbvoc_binary(path)
    return load_orbvoc_text(path)


def save_orbvoc_binary(voc_nodes, path: str):
    """Write a DBoW2 binary vocabulary from raw node rows
    (parents, is_leaf, desc_bytes (N, 32), weights) — the test fixture
    writer for round-tripping synthetic vocabularies."""
    parents, is_leaf, desc_bytes, weights, K, L = voc_nodes
    n = len(parents)
    recs = np.zeros(n, _BIN_NODE)
    recs["parent"] = parents
    recs["desc"] = desc_bytes
    recs["weight"] = weights
    recs["is_leaf"] = is_leaf
    with open(path, "wb") as f:
        f.write(np.asarray([n, _BIN_NODE.itemsize], "<u4").tobytes())
        f.write(np.asarray([K, L, 0, 0], "<i4").tobytes())
        f.write(recs.tobytes())
