"""Vocabulary ingest + query at the reference's tree shape (verdict #7).

The reference boots a pretrained 10^6-word DBoW2 vocabulary (K=10, L=6;
/root/reference/src/System.cc:76-87). These tests push a generated
complete tree of that shape through the binary ingest, the .npz
round-trip, and the batched query path, and pin the scale properties
that matter at 10^6 words: the complete-array layout stays ~48 MB
resident, ingest is vectorized (no per-node Python loop), and repeated
queries reuse the device-resident tree instead of re-uploading ~36 MB
per keyframe. Full-scale wall-clock numbers live in
docs/vocab_scale.md (tools/vocab_reference_scale.py)."""

import time

import numpy as np
import pytest

from dspslam_tpu.place import orbvoc
from dspslam_tpu.place.vocabulary import Vocabulary

import sys
sys.path.insert(0, "tools")
from vocab_reference_scale import generate_complete_dbow2  # noqa: E402


def test_reference_shape_ingest_and_query(tmp_path):
    """Full reference shape: 10^6 words, 1.11M nodes."""
    path = str(tmp_path / "voc.bin")
    n_nodes = generate_complete_dbow2(10, 6, path)
    assert n_nodes == 1_111_110
    voc = orbvoc.load_orbvoc_binary(path)
    assert voc.n_words == 1_000_000
    resident = (
        voc.centers.nbytes + voc.valid.nbytes + voc.leaf_word.nbytes
        + voc.word_weights.nbytes
    )
    assert resident < 60e6          # complete-array layout must not blow up

    rng = np.random.default_rng(1)
    q = rng.integers(0, 2**32, (2000, 8), dtype=np.uint32)
    words = voc.assign_words(q)
    assert words.min() >= 0 and words.max() < voc.n_words
    # descent parity vs brute-force on a small probe: the array descent
    # must reach the word a greedy per-level argmin reaches
    probe = q[:8]
    for d, w in zip(probe, voc.assign_words(probe)):
        node = 0
        offset = 0
        for lvl in range(6):
            cents = voc.centers[offset + node * 10: offset + node * 10 + 10]
            x = (d[None, :] ^ cents).view(np.uint8)
            dist = np.unpackbits(x, axis=-1).sum(-1)
            node = node * 10 + int(np.argmin(dist))
            offset += 10 ** (lvl + 1)
        assert voc.leaf_word[node] == w

    bv = voc.bow_vector(q)
    assert len(bv.words) > 0
    np.testing.assert_allclose(bv.weights.sum(), 1.0, rtol=1e-5)

    # device-tree cache: repeated queries must not re-upload the 36 MB
    # centers array (the cache is keyed on the numpy array's identity)
    dev1, _ = voc._device_tree()
    voc.assign_words(q)
    dev2, _ = voc._device_tree()
    assert dev1 is dev2


def test_reference_shape_npz_roundtrip(tmp_path):
    path = str(tmp_path / "voc.bin")
    generate_complete_dbow2(10, 6, path, seed=2)
    voc = orbvoc.load_orbvoc_binary(path)
    npz = str(tmp_path / "voc.npz")
    voc.save(npz)
    voc2 = Vocabulary.load(npz)
    rng = np.random.default_rng(3)
    q = rng.integers(0, 2**32, (512, 8), dtype=np.uint32)
    np.testing.assert_array_equal(voc.assign_words(q), voc2.assign_words(q))


def test_query_latency_scales(tmp_path):
    """Steady-state query at 2000 descriptors must stay in single-digit
    milliseconds per tree level — i.e. the descent is 6 batched Hamming
    argmins, not a per-descriptor walk. Generous bound (CI boxes are
    contended); the recorded number is ~5 ms (docs/vocab_scale.md)."""
    path = str(tmp_path / "voc.bin")
    generate_complete_dbow2(10, 6, path, seed=4)
    voc = orbvoc.load_orbvoc_binary(path)
    rng = np.random.default_rng(5)
    q = rng.integers(0, 2**32, (2000, 8), dtype=np.uint32)
    voc.bow_vector(q)               # jit + upload
    t0 = time.perf_counter()
    for _ in range(3):
        voc.bow_vector(q)
    ms = (time.perf_counter() - t0) / 3 * 1e3
    assert ms < 200.0, f"query took {ms:.1f} ms at 2000 descriptors"
