"""Vocabulary scale curve: 10^4 vs 10^5 words at 2k-keyframe scale.

The reference ships a 10^6-word ORBvoc (K=10, L=6, System.cc:76-87)
because loop detection on self-similar streets needs fine word cells;
this framework trains per-deployment vocabularies (train_vocabulary.py).
This tool measures what the word count buys at database scale: train
wall time, per-keyframe word-assignment latency, database query latency
at >=2000 stored keyframes, and loop-retrieval precision/recall with a
measured true/false score margin. The recorded numbers drive the
default in apps/train_vocabulary.py (see docs/vocab_scale.md).

Synthetic street model (scaled from tests/test_vocab_scale.py): P
places with place-specific descriptor pools over a shared background
pool (60% of every image is generic street texture), per-observation
bit noise, revisit queries against an exclude set mimicking the loop
closer's covisible-group exclusion.

Usage: JAX_PLATFORMS=cpu python tools/vocab_scale_curve.py
       [--levels 4 5] [--places 210] [--kf_per_place 10]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

from dspslam_tpu.place.vocabulary import KeyFrameDatabase, Vocabulary

N_BG = 4000
N_PLACE = 250
N_FEAT = 350
BG_FRACTION = 0.6


def _pool(n, rng):
    return rng.integers(0, 2 ** 32, size=(n, 8), dtype=np.uint32)


def _noisy(descs, rng, n_bits=4):
    out = descs.copy()
    for _ in range(n_bits):
        word = rng.integers(0, 8, size=len(out))
        bit = rng.integers(0, 32, size=len(out)).astype(np.uint32)
        out[np.arange(len(out)), word] ^= (np.uint32(1) << bit)
    return out


def build_scene(n_places, rng):
    bg = _pool(N_BG, rng)
    places = [_pool(N_PLACE, rng) for _ in range(n_places)]

    def keyframe_descs(place_idx, rng):
        nb = int(N_FEAT * BG_FRACTION)
        d = np.concatenate([
            bg[rng.choice(N_BG, nb, replace=False)],
            places[place_idx][rng.choice(N_PLACE, N_FEAT - nb,
                                         replace=False)],
        ])
        return _noisy(d, rng)

    return bg, places, keyframe_descs


def eval_vocab(voc, n_places, kf_per_place, keyframe_descs, train_s):
    res = {"n_words": voc.n_words, "train_s": round(train_s, 1)}

    # ---- per-keyframe word assignment latency (device path) ----------
    rng = np.random.default_rng(1000)
    probe = keyframe_descs(0, rng)
    voc.bow_vector(probe)                      # compile/warm
    ts = []
    for _ in range(20):
        t0 = time.perf_counter()
        voc.bow_vector(keyframe_descs(1, rng))
        ts.append(time.perf_counter() - t0)
    res["assign_ms_per_kf"] = round(float(np.median(ts)) * 1e3, 2)

    # ---- populate database ------------------------------------------
    db = KeyFrameDatabase(voc)
    kf_place = {}
    rng = np.random.default_rng(7)
    kf_id = 0
    t0 = time.perf_counter()
    for p in range(n_places):
        for _ in range(kf_per_place):
            db.add(kf_id, voc.bow_vector(keyframe_descs(p, rng)))
            kf_place[kf_id] = p
            kf_id += 1
    res["db_kfs"] = kf_id
    res["db_build_s"] = round(time.perf_counter() - t0, 1)

    # ---- query latency + retrieval quality --------------------------
    qrng = np.random.default_rng(99)
    n_query = min(60, n_places)
    lat, top1_ok, accepted, accepted_true = [], 0, 0, 0
    recall_hits = 0
    true_tops, novel_tops = [], []
    for qi in range(n_query):
        p = int(qrng.integers(0, n_places))
        q = voc.bow_vector(keyframe_descs(p, qrng))
        # exclude the query place's most recent neighbors the way the
        # loop closer excludes the covisible group: here exclude NOTHING
        # from the true place (the revisit is long after the mapping
        # pass), but exclude the "current" place = a different random one
        exclude = {
            k for k, pl in kf_place.items()
            if pl == (p + 1) % n_places
        }
        t0 = time.perf_counter()
        cands = db.query(q, min_score=0.05, exclude=exclude)
        lat.append(time.perf_counter() - t0)
        if cands:
            true_tops.append(cands[0][1])
            if kf_place[cands[0][0]] == p:
                top1_ok += 1
            if any(kf_place[k] == p for k, _ in cands):
                recall_hits += 1
            accepted += len(cands)
            accepted_true += sum(1 for k, _ in cands if kf_place[k] == p)
    res["query_ms_per_kf"] = round(float(np.median(lat)) * 1e3, 2)
    res["top1_accuracy"] = round(top1_ok / n_query, 3)
    res["recall"] = round(recall_hits / n_query, 3)
    res["candidate_precision"] = round(
        accepted_true / max(accepted, 1), 3
    )

    # ---- false-positive margin: novel places never mapped -----------
    nrng = np.random.default_rng(55)
    bg = _pool(N_BG, np.random.default_rng(3))   # scene bg (first draw)
    for _ in range(20):
        novel = _pool(N_PLACE, nrng)
        nb = int(N_FEAT * BG_FRACTION)
        d = np.concatenate([
            bg[nrng.choice(N_BG, nb, replace=False)],
            novel[nrng.choice(N_PLACE, N_FEAT - nb, replace=False)],
        ])
        cands = db.query(voc.bow_vector(_noisy(d, nrng)), 0.0, set())
        novel_tops.append(cands[0][1] if cands else 0.0)
    res["true_top_score_median"] = round(float(np.median(true_tops)), 4)
    res["novel_top_score_median"] = round(float(np.median(novel_tops)), 4)
    res["score_margin"] = round(
        float(np.median(true_tops) / max(np.median(novel_tops), 1e-9)), 2
    )
    return res


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--levels", type=int, nargs="+", default=[4, 5])
    p.add_argument("--branching", type=int, default=10)
    p.add_argument("--places", type=int, default=210)
    p.add_argument("--kf_per_place", type=int, default=10)
    p.add_argument("--train_renditions", type=int, default=6)
    args = p.parse_args(argv)

    rng = np.random.default_rng(3)
    bg, places, keyframe_descs = build_scene(args.places, rng)
    # training corpus: several noisy renditions per place (how DBoW2
    # corpora are built — many overlapping views of the same scenes)
    corpus = np.concatenate(
        [keyframe_descs(p, np.random.default_rng(100 + 31 * p + r))
         for p in range(args.places) for r in range(args.train_renditions)]
        + [_noisy(bg, np.random.default_rng(60 + r)) for r in range(3)]
    )
    print(f"corpus: {len(corpus)} descriptors from {args.places} places")

    out = []
    for lv in args.levels:
        t0 = time.perf_counter()
        voc = Vocabulary.train(
            corpus, branching=args.branching, levels=lv, iters=6, seed=0
        )
        train_s = time.perf_counter() - t0
        print(f"L={lv}: trained {voc.n_words} words in {train_s:.1f} s")
        res = eval_vocab(
            voc, args.places, args.kf_per_place, keyframe_descs, train_s
        )
        res["levels"] = lv
        out.append(res)
        print(json.dumps(res))
    print(json.dumps({"curve": out}))
    return out


if __name__ == "__main__":
    main()
