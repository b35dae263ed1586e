"""Synthetic layered stereo worlds for tests, demos and benchmarks.

A `LayeredWorld` is a textured ground plane plus a stack of
fronto-parallel textured planes at different depths, rendered under
pure-x camera translation by per-layer parallax shift (planes shift by
fx * cam_x / z; ground rows shift by cam_x * (v - cy) / h). Layers are
composited per pixel by depth, so occlusion is geometrically
consistent. The same render with `baseline` added to cam_x is the
right-eye view — pixel-exact stereo at negligible cost.

Design notes (born out of tracking-stability forensics):
  * Fronto-parallel planes alone are degenerate for SLAM: camera y/z
    are only constrained by NEAR structure, and without it the pose
    estimate random-walks under the constant-velocity model until the
    chi2 gates starve tracking (error roughly doubles per frame once
    the motion model extrapolates an uncorrected component). Real
    street scenes anchor y/z with the ground plane — so this world has
    one too.
  * Texture must be locally UNIQUE: repeated identical squares alias
    under BRIEF descriptors and mint wrong matches. Blobs here get
    per-blob random intensity on a noise base, so every corner
    neighbourhood is distinct.
"""

from __future__ import annotations

import numpy as np


class LayeredWorld:
    """Ground plane + multi-depth planes, rendered by parallax shift.

    Args:
      width/height: rendered image size (px).
      fx: focal length (px); cx, cy: principal point (defaults center).
      depths: plane depths, far to near (m). The farthest plane is
        fully opaque; nearer planes are sparse patch layers.
      coverage: fraction of each nearer layer covered by patches.
      ground_height: camera height above the ground plane (m); set to
        None to disable the ground.
      max_ground_depth: ground rendered for rows with depth below this.
      x_range: camera x travel (m) the canvases must support.
      seed: texture RNG seed.
    """

    def __init__(
        self,
        width: int,
        height: int,
        fx: float,
        cx: float | None = None,
        cy: float | None = None,
        depths: tuple = (25.0, 12.0, 7.0),
        coverage: tuple = (1.0, 0.30, 0.18),
        ground_height: float | None = 1.5,
        max_ground_depth: float = 30.0,
        x_range: tuple = (-1.0, 12.0),
        seed: int = 0,
    ):
        self.width, self.height, self.fx = width, height, fx
        self.cx = width / 2.0 if cx is None else cx
        self.cy = height / 2.0 if cy is None else cy
        self.depths = tuple(depths)
        self.ground_height = ground_height
        rng = np.random.default_rng(seed)

        self.layers = []           # (z, shift_min, texture)
        for z, cover in zip(depths, coverage):
            shift_min = int(np.floor(fx * x_range[0] / z)) - 4
            shift_max = int(np.ceil(fx * x_range[1] / z)) + 4
            canvas_w = width + (shift_max - shift_min)
            if cover >= 1.0:
                tex = self._texture(rng, height, canvas_w)
            else:
                tex = np.full((height, canvas_w), np.nan, np.float32)
                # grid placement guarantees coverage everywhere along x
                pitch = max(24, int(56 / max(cover, 1e-3) * 0.35))
                for gx in range(4, canvas_w - 60, pitch):
                    for _ in range(2):
                        s = int(rng.integers(22, 46))
                        y0 = int(rng.integers(4, max(5, height - s - 4)))
                        tex[y0 : y0 + s, gx : gx + s] = self._texture(
                            rng, s, s
                        )
            self.layers.append((float(z), shift_min, tex))

        if ground_height is not None:
            # ground occupies rows v with depth fx*h/(v-cy) <= max depth
            v0 = int(np.ceil(self.cy + fx * ground_height / max_ground_depth))
            self.ground_v0 = max(v0, int(self.cy) + 2)
            rows = np.arange(self.ground_v0, height)
            self.ground_z = fx * ground_height / (rows - self.cy)
            # per-row shift = cam_x * (v - cy) / h; canvas must span it
            smax = (
                int(np.ceil(max(abs(x_range[0]), abs(x_range[1]))
                            * (height - self.cy) / ground_height)) + 4
            )
            self.ground_smin = -smax
            self.ground_tex = self._texture(
                rng, len(rows), width + 2 * smax
            )

    @staticmethod
    def _texture(rng, h, w):
        """Noise base + distinct-intensity blobs: corner-rich and
        locally unique (no two blobs look alike to a descriptor).

        The result is band-limited with a small separable blur: real
        images are low-pass filtered by the lens/sensor PSF, and
        un-band-limited per-pixel noise breaks every subpixel method
        built on local smoothness (SAD parabola fits land on cusps,
        and a 1 px misalignment fully decorrelates patches — which is
        what made ground stereo matching collapse on this fixture)."""
        img = rng.normal(95.0, 20.0, (h, w)).astype(np.float32)
        n_blobs = max(1, (h * w) // 260)
        ys = rng.integers(0, max(1, h - 10), n_blobs)
        xs = rng.integers(0, max(1, w - 10), n_blobs)
        for y, x in zip(ys, xs):
            s = int(rng.integers(3, 9))
            img[y : y + s, x : x + s] = rng.uniform(25.0, 235.0)
        k = np.array([0.25, 0.5, 0.25], np.float32)
        for axis in (0, 1):
            img = np.apply_along_axis(
                lambda m: np.convolve(m, k, mode="same"), axis, img
            )
        return np.clip(img, 0.0, 255.0)

    @staticmethod
    def _subpixel_crop(tex, shift: float, width: int):
        """Linear-interpolated horizontal crop at a fractional shift.

        Integer-rounded shifts would quantize each layer's disparity by
        up to +-0.5 px — a POSITION-DEPENDENT systematic depth bias
        (+-0.4 m at 12 m with bf=200) that makes points spawned at
        different camera positions disagree about the same plane and
        destabilizes any SLAM run on the fixture. Subpixel rendering
        keeps the stereo geometry honest."""
        s0 = int(np.floor(shift))
        f = np.float32(shift - s0)
        a = tex[:, s0 : s0 + width]
        b = tex[:, s0 + 1 : s0 + 1 + width]
        return (1.0 - f) * a + f * b

    def _compose(self, cam_x: float):
        """(image, depth) stack composited nearest-first per pixel."""
        img = None
        dep = None
        for z, shift_min, tex in self.layers:
            crop = self._subpixel_crop(
                tex, self.fx * cam_x / z - shift_min, self.width
            )
            if img is None:
                img = crop.copy()
                dep = np.full(crop.shape, z, np.float32)
            else:
                m = ~np.isnan(crop) & (z < dep)
                img[m] = crop[m]
                dep[m] = z
        if self.ground_height is not None:
            rows = np.arange(self.ground_v0, self.height)
            shift_f = (
                cam_x * (rows - self.cy) / self.ground_height
                - self.ground_smin
            )
            s0 = np.floor(shift_f).astype(np.int64)
            fr = (shift_f - s0).astype(np.float32)[:, None]
            cols = s0[:, None] + np.arange(self.width)[None, :]
            ridx = np.arange(len(rows))[:, None]
            g = (
                (1.0 - fr) * self.ground_tex[ridx, cols]
                + fr * self.ground_tex[ridx, cols + 1]
            )
            gz = np.broadcast_to(self.ground_z[:, None], g.shape)
            sub_d = dep[self.ground_v0 :]
            sub_i = img[self.ground_v0 :]
            m = gz < sub_d
            sub_i[m] = g[m]
            sub_d[m] = gz[m]
        return img, dep

    def render(self, cam_x: float, baseline: float = 0.0) -> np.ndarray:
        """Left (baseline=0) or right (baseline=b) view at camera x."""
        return self._compose(cam_x + baseline)[0]

    def depth_map(self, cam_x: float) -> np.ndarray:
        """Ground-truth depth of the rendered left view (for tests)."""
        return self._compose(cam_x)[1]

    def point_depth_error(self, pos_w: np.ndarray) -> np.ndarray:
        """Distance of world points from the nearest world surface
        (plane depths or the ground) — a map-quality oracle for tests."""
        pos_w = np.atleast_2d(pos_w)
        errs = [
            np.min(
                np.abs(pos_w[:, 2:3] - np.asarray(self.depths)[None, :]),
                axis=1,
            )
        ]
        if self.ground_height is not None:
            errs.append(np.abs(pos_w[:, 1] - self.ground_height))
        return np.minimum.reduce(errs)
