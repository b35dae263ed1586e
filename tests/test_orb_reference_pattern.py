"""ORB reference-pattern mode: bit parity with the OpenCV/reference
computeOrbDescriptor semantics (/root/reference/src/ORBextractor.cc:
109-143 — rotate the learned 512-point table by the keypoint angle,
round offsets, sample, pack t0<t1 bits into bytes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dspslam_tpu.frontend import orb
from dspslam_tpu.frontend.orb_pattern import reference_pattern

RNG = np.random.default_rng(11)


def test_pattern_table_shape_and_values():
    p = reference_pattern()
    assert p.shape == (256, 2, 2)
    # spot anchors of the learned table (ORBextractor.cc:152-153, 409)
    np.testing.assert_array_equal(p[0], [[8, -3], [9, 5]])
    np.testing.assert_array_equal(p[1], [[4, 2], [7, -12]])
    np.testing.assert_array_equal(p[-1], [[-1, -6], [0, -11]])
    assert p.min() >= -13 and p.max() <= 13
    # 512 distinct sample points would exceed the patch otherwise
    assert np.all(np.abs(p) <= orb.HALF_PATCH - 2)


def _reference_descriptor(img, x, y, angle, pattern):
    """Host reimplementation of computeOrbDescriptor: per-endpoint
    offset rounding relative to the integer center, byte packing bit j
    of byte i = pair 8i+j (ORBextractor.cc:119-143)."""
    a, b = np.cos(angle), np.sin(angle)
    desc = np.zeros(32, np.uint8)
    for i in range(256):
        vals = []
        for e in range(2):
            px, py = pattern[i, e]
            col = int(np.round(px * a - py * b))
            row = int(np.round(px * b + py * a))
            vals.append(img[y + row, x + col])
        if vals[0] < vals[1]:
            desc[i // 8] |= 1 << (i % 8)
    return desc


def test_descriptor_bit_parity_with_reference_semantics():
    pattern = reference_pattern()
    H, W = 96, 128
    img = RNG.uniform(0, 255, (H, W)).astype(np.float32)

    # integer keypoints well inside the border, incl. angle 0 and
    # arbitrary rotations
    xs = np.asarray([40, 64, 90, 25, 70], np.int32)
    ys = np.asarray([30, 48, 60, 70, 25], np.int32)
    angles = np.asarray([0.0, 0.7, -1.3, 2.9, 4.0], np.float32)

    ours = np.asarray(
        orb.brief_descriptors(
            jnp.asarray(img),
            jnp.stack([xs, ys], -1).astype(jnp.float32),
            jnp.asarray(angles),
            jnp.asarray(pattern),
        )
    )
    # (K, 8) uint32 little-endian == the reference's 32 bytes
    ours_bytes = ours.view("<u4").astype("<u4").view(np.uint8).reshape(-1, 32)

    for k in range(len(xs)):
        ref = _reference_descriptor(
            img, int(xs[k]), int(ys[k]), float(angles[k]), pattern
        )
        np.testing.assert_array_equal(
            ours_bytes[k], ref,
            err_msg=f"keypoint {k} (angle {angles[k]}) bit mismatch",
        )


def test_all_brief_backends_agree_on_reference_pattern():
    pattern = jnp.asarray(reference_pattern())
    img = jnp.asarray(RNG.uniform(0, 255, (80, 100)).astype(np.float32))
    xy = jnp.asarray([[40.0, 30.0], [60.0, 50.0]], jnp.float32)
    ang = jnp.asarray([0.5, -0.9], jnp.float32)
    d_global = orb.brief_descriptors(img, xy, ang, pattern)
    d_patch = orb.brief_descriptors_patch(img, xy, ang, pattern)
    d_onehot = orb.brief_descriptors_onehot(img, xy, ang, pattern)
    np.testing.assert_array_equal(np.asarray(d_global), np.asarray(d_patch))
    np.testing.assert_array_equal(np.asarray(d_global), np.asarray(d_onehot))


def test_extract_with_reference_pattern():
    params = orb.ORBParams(
        n_features=200, n_levels=2, pattern="reference", fast_backend="xla"
    )
    img = RNG.uniform(0, 255, (120, 160)).astype(np.float32)
    # add corners so FAST finds something
    img[30:40, 30:40] = 255.0
    img[70:84, 90:104] = 0.0
    out = jax.device_get(orb.extract(jnp.asarray(img), params))
    assert out["valid"].sum() > 0
    assert out["desc"].dtype == np.uint32
