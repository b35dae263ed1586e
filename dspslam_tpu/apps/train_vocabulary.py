"""Train a BoW vocabulary from sequence images.

The reference ships a pretrained DBoW2 ORBvoc for OpenCV's BRIEF
pattern; this framework's pattern differs (frontend.orb.brief_pattern),
so vocabularies are trained per-deployment. (To use the reference's
shipped ORBvoc instead, load it with Vocabulary.load_any and extract
with ORBParams(pattern="reference").)

Default K=10, L=5 (10^5 words): measured at 2100-keyframe scale this
widens the true-revisit/novel-place score margin 1.66x -> 2.56x and
*speeds up* database queries vs 10^4 words (sparser inverted index) —
see docs/vocab_scale.md and tools/vocab_scale_curve.py. The corpus
should carry at least ~3 descriptors per word; the CLI warns when it
is thinner (drop --levels to 4 for short indoor sequences).

Usage:
    python -m dspslam_tpu.apps.train_vocabulary \
        --image_dir <dir with pngs> --output voc.npz \
        [--stride 10] [--branching 10] [--levels 5]
"""

from __future__ import annotations

import argparse
import os

import jax.numpy as jnp
import numpy as np

from ..frontend import orb
from ..place.vocabulary import Vocabulary
from ..utils import io as io_mod


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--image_dir", required=True)
    p.add_argument("--output", default="voc.npz")
    p.add_argument("--stride", type=int, default=10)
    p.add_argument("--branching", type=int, default=10)
    p.add_argument("--levels", type=int, default=5)
    p.add_argument("--max_images", type=int, default=200)
    args = p.parse_args(argv)

    files = sorted(
        f for f in os.listdir(args.image_dir) if f.endswith((".png", ".jpg"))
    )[:: args.stride][: args.max_images]
    params = orb.ORBParams()
    descs = []
    for f in files:
        img = io_mod.load_image_rgb(os.path.join(args.image_dir, f)).astype(
            np.float32
        ) @ np.array([0.299, 0.587, 0.114], np.float32)
        feats = orb.extract(jnp.asarray(img), params)
        valid = np.asarray(feats["valid"]) > 0
        descs.append(np.asarray(feats["desc"])[valid])
        print(f"{f}: {valid.sum()} descriptors")
    all_descs = np.concatenate(descs)
    n_words = args.branching ** args.levels
    if len(all_descs) < 3 * n_words:
        print(
            f"warning: corpus has {len(all_descs)} descriptors for "
            f"{n_words} words (<3/word) — word cells will be underfit; "
            f"add images (--stride/--max_images) or drop --levels"
        )
    voc = Vocabulary.train(all_descs, args.branching, args.levels)
    voc.save(args.output)
    print(f"trained {voc.n_words}-word vocabulary from {len(all_descs)} "
          f"descriptors -> {args.output}")


if __name__ == "__main__":
    main()
