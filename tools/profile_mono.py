"""Mono pipeline phase breakdown on the live TPU relay.

Answers VERDICT r3 item 2 with data: where do Freiburg-mono frame
milliseconds go — image upload (518 KB/frame), device compute, result
fetch, or keyframe host work — and what is the wire ceiling the relay
imposes at 960x540 @ 25 fps (13 MB/s upstream)?

Three measurements:
  A. wire ceiling: back-to-back device_put of the real frames + tiny
     fetch (no SLAM) — the fastest any 518 KB/frame loop can go;
  B. preloaded loop: ALL frames on device before the clock starts —
     the SLAM pipeline with zero upload on the measured path;
  C. streaming loop: the real benchmark loop (upload k+1 during
     frame k) with per-phase timers (upload call, track call, inner
     finalize fetch), split keyframe vs tracking frames.

Usage: python tools/profile_mono.py [--frames 30] [--profile freiburg]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=30)
    p.add_argument("--profile", default="freiburg",
                   choices=("redwood", "freiburg"))
    args = p.parse_args(argv)

    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir", "/tmp/dspslam_jax_cache"
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from dspslam_tpu.apps.benchmark_slam import MONO_PROFILES, STEP
    from dspslam_tpu.datasets.synthetic import LayeredWorld, \
        strafe_yaw_trajectory
    from dspslam_tpu.frontend import orb
    from dspslam_tpu.slam.system import SLAMSystem
    from dspslam_tpu.slam.tracking import Tracker, TrackerConfig

    prof = MONO_PROFILES[args.profile]
    mw, mh, mfx = prof["w"], prof["h"], prof["fx"]
    world = LayeredWorld(
        mw, mh, mfx, cx=prof["cx"], cy=prof["cy"], depths=(25.0, 12.0, 7.0),
        ground_height=1.65, x_range=(-1.0, 0.3 * (args.frames + 2)),
        seed=0, yaw_max=np.radians(24.0),
    )
    traj = strafe_yaw_trajectory(
        args.frames + 1, step=STEP, yaw_start=max(6, args.frames // 3),
        yaw_frames=max(8, args.frames // 3), total_yaw=np.radians(20.0),
    )
    host_imgs = [
        np.clip(world.render_pose(T), 0, 255).astype(np.uint8) for T in traj
    ]
    frame_bytes = host_imgs[0].nbytes
    print(f"{args.profile}: {mw}x{mh} = {frame_bytes/1024:.0f} KB/frame, "
          f"{frame_bytes * prof['fps'] / 1e6:.1f} MB/s at {prof['fps']:.0f}"
          " fps pacing")

    # ---- A: wire ceiling --------------------------------------------
    a = jax.device_put(host_imgs[0])
    np.asarray(a[::64, ::64]).sum()
    ts = []
    for k in range(min(12, len(host_imgs))):
        t0 = time.perf_counter()
        a = jax.device_put(host_imgs[k])
        np.asarray(a[::64, ::64]).sum()
        ts.append(time.perf_counter() - t0)
    wire_ms = float(np.median(ts)) * 1e3
    print(f"A. wire ceiling: {wire_ms:.1f} ms/frame upload+ack "
          f"(≥{1e3 / max(wire_ms, 1e-9):.1f} fps upper bound incl. RTT)")

    def build_system():
        cfg = TrackerConfig(
            fx=mfx, fy=mfx, cx=prof["cx"], cy=prof["cy"], bf=mfx * 0.5,
            width=mw, height=mh, min_init_features=400,
            max_frames_between_kf=5, search_radius_motion=25.0,
            pipelined=True,
        )
        return SLAMSystem(
            tracker_cfg=cfg,
            orb_params=orb.ORBParams(n_features=4000, n_levels=8),
        )

    def timed_run(name, get_img, instrument=False):
        system = build_system()
        fin_times = []
        if instrument:
            orig = Tracker._finalize_inflight

            def wrapped(self, h):
                t0 = time.perf_counter()
                out = orig(self, h)
                fin_times.append(time.perf_counter() - t0)
                return out

            Tracker._finalize_inflight = wrapped
        try:
            kf_counts, times, up_times = [], [], []
            img = get_img(0)
            for k in range(args.frames):
                t0 = time.perf_counter()
                nxt = get_img(k + 1) if k + 1 < args.frames else None
                t1 = time.perf_counter()
                system.track_mono(img, k * 0.1)
                t2 = time.perf_counter()
                up_times.append(t1 - t0)
                times.append(t2 - t1)
                kf_counts.append(len(system.map.keyframes))
                img = nxt
            system.flush()
        finally:
            if instrument:
                Tracker._finalize_inflight = orig
        warm = 6
        steady = np.asarray(times[warm:])
        ups = np.asarray(up_times[warm:])
        is_kf = np.diff([0] + kf_counts)[warm:] > 0
        med = float(np.median(steady)) * 1e3
        print(
            f"{name}: median frame {med:.1f} ms ({1e3 / med:.1f} fps), "
            f"mean {steady.mean() * 1e3:.1f} ms | upload call "
            f"{np.median(ups) * 1e3:.1f} ms | KF frames "
            f"{np.median(steady[is_kf]) * 1e3:.1f} ms x{int(is_kf.sum())}, "
            f"track frames {np.median(steady[~is_kf]) * 1e3:.1f} ms"
            + (f" | finalize fetch median "
               f"{np.median(fin_times[warm:]) * 1e3:.1f} ms"
               if fin_times else "")
        )
        return med

    # ---- B: preloaded (no upload on the measured path) --------------
    dev_imgs = [jax.device_put(im) for im in host_imgs]
    np.asarray(dev_imgs[-1][::64, ::64]).sum()
    timed_run("B. preloaded", lambda k: dev_imgs[k], instrument=True)

    # ---- C: streaming (the real loop) -------------------------------
    timed_run(
        "C. streaming",
        lambda k: jax.device_put(host_imgs[k]) if k < len(host_imgs) else None,
        instrument=True,
    )


if __name__ == "__main__":
    main()
