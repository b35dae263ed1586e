"""Vocabulary at reference scale: 10^6 words, K=10, L=6 (verdict r04 #7).

The reference ships a pretrained 10^6-word DBoW2 ORB vocabulary loaded
at boot (/root/reference/src/System.cc:76-87; tree shape K=10 L=6,
TemplatedVocabulary.h). No real ORBvoc file exists in this environment,
so this tool GENERATES a complete tree of that exact shape (random
descriptors — layout cost, memory, and query latency are
descriptor-independent), writes it in DBoW2's binary format, and pushes
it through the full ingest + query path:

  * load_orbvoc_binary parse + complete-array layout seconds,
  * resident memory of the array form (centers + valid + leaf_word),
  * .npz save/load round-trip seconds,
  * bow_vector latency at 2000 descriptors (the reference's per-KF
    query size at mono feature budgets), steady-state after jit.

Run:  python tools/vocab_reference_scale.py [--branching 10 --levels 6]
Emits one JSON line; numbers recorded in docs/vocab_scale.md.
"""

import argparse
import json
import os
import time

import numpy as np


def generate_complete_dbow2(K: int, L: int, path: str, seed: int = 0):
    """Complete K-ary depth-L tree in DBoW2 binary node order (BFS,
    parent ids < child ids — the order TemplatedVocabulary::save*
    emits)."""
    from dspslam_tpu.place import orbvoc

    rng = np.random.default_rng(seed)
    n_nodes = sum(K ** (l + 1) for l in range(L))
    parents = np.zeros(n_nodes, np.int64)
    start, prev_start = 1, 0
    for l in range(L):
        cnt = K ** (l + 1)
        ids = np.arange(start, start + cnt)
        parents[ids - 1] = prev_start + (ids - start) // K
        prev_start = start
        start += cnt
    is_leaf = np.zeros(n_nodes, np.int64)
    is_leaf[-(K**L):] = 1
    desc = rng.integers(0, 256, (n_nodes, 32), dtype=np.uint8)
    weights = rng.random(n_nodes).astype(np.float32) * is_leaf
    orbvoc.save_orbvoc_binary((parents, is_leaf, desc, weights, K, L), path)
    return n_nodes


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--branching", type=int, default=10)
    p.add_argument("--levels", type=int, default=6)
    p.add_argument("--n_query", type=int, default=2000)
    args = p.parse_args(argv)
    K, L = args.branching, args.levels

    from dspslam_tpu.place import orbvoc

    bin_path = f"/tmp/orbvoc_ref_scale_K{K}_L{L}.bin"
    t0 = time.perf_counter()
    n_nodes = generate_complete_dbow2(K, L, bin_path)
    gen_s = time.perf_counter() - t0
    bin_mb = os.path.getsize(bin_path) / 1e6

    t0 = time.perf_counter()
    voc = orbvoc.load_orbvoc_binary(bin_path)
    load_s = time.perf_counter() - t0
    resident_mb = (
        voc.centers.nbytes + voc.valid.nbytes + voc.leaf_word.nbytes
        + voc.word_weights.nbytes
    ) / 1e6

    npz_path = f"/tmp/orbvoc_ref_scale_K{K}_L{L}.npz"
    t0 = time.perf_counter()
    voc.save(npz_path)
    save_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    from dspslam_tpu.place.vocabulary import Vocabulary

    voc2 = Vocabulary.load(npz_path)
    npz_load_s = time.perf_counter() - t0
    assert voc2.n_words == voc.n_words

    rng = np.random.default_rng(1)
    q = rng.integers(0, 2**32, (args.n_query, 8), dtype=np.uint32)
    t0 = time.perf_counter()
    bv = voc.bow_vector(q)
    first_q_s = time.perf_counter() - t0          # jit compile + upload
    reps = 10
    t0 = time.perf_counter()
    for _ in range(reps):
        bv = voc.bow_vector(q)
    query_ms = (time.perf_counter() - t0) / reps * 1e3
    assert len(bv.words) > 0

    out = {
        "metric": "vocab_reference_scale",
        "branching": K,
        "levels": L,
        "n_words": voc.n_words,
        "n_nodes_file": n_nodes,
        "generate_s": round(gen_s, 2),
        "bin_file_mb": round(bin_mb, 1),
        "load_layout_s": round(load_s, 2),
        "resident_mb": round(resident_mb, 1),
        "npz_save_s": round(save_s, 2),
        "npz_load_s": round(npz_load_s, 2),
        "first_query_s": round(first_q_s, 2),
        "query_ms_at_n": round(query_ms, 1),
        "n_query": args.n_query,
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
