"""Deterministic synthetic test video generator.

No real video ships in this environment (no bunny/UVG), so at-scale runs
use a procedurally generated clip with video-like structure: smooth global
motion, rotating high-frequency texture, moving occluders, and temporally
coherent detail — hard enough that a NeRV must actually fit signal, easy
enough that PSNR curves are comparable across trainers.

Usage:
  python tools/make_synth_video.py OUTDIR [--frames 132] [--h 720] [--w 1280]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def synth_frame(t: float, h: int, w: int) -> np.ndarray:
    """One RGB frame in [0,1], t in [0,1)."""
    yy, xx = np.meshgrid(np.linspace(0, 1, h, dtype=np.float32),
                         np.linspace(0, 1, w, dtype=np.float32),
                         indexing="ij")
    # slow global pan of a smooth color field
    base_r = 0.5 + 0.4 * np.sin(2 * np.pi * (xx + 0.3 * t))
    base_g = 0.5 + 0.4 * np.sin(2 * np.pi * (yy - 0.2 * t) + 1.0)
    base_b = 0.5 + 0.4 * np.sin(2 * np.pi * (xx + yy + 0.15 * t) + 2.0)
    # rotating anisotropic texture (high spatial frequency)
    ang = 2 * np.pi * t * 0.5
    u = np.cos(ang) * (xx - 0.5) + np.sin(ang) * (yy - 0.5)
    v = -np.sin(ang) * (xx - 0.5) + np.cos(ang) * (yy - 0.5)
    tex = 0.5 + 0.25 * np.sin(80 * u) * np.cos(60 * v)
    # two moving occluder discs
    cx1, cy1 = 0.5 + 0.3 * np.cos(2 * np.pi * t), 0.5 + 0.3 * np.sin(2 * np.pi * t)
    cx2, cy2 = 0.5 + 0.25 * np.cos(-4 * np.pi * t + 1), 0.5 + 0.25 * np.sin(-4 * np.pi * t + 1)
    d1 = ((xx - cx1) ** 2 + (yy - cy1) ** 2) < 0.02
    d2 = ((xx - cx2) ** 2 + (yy - cy2) ** 2) < 0.008
    frame = np.stack([base_r * tex, base_g * tex, base_b * tex], axis=-1)
    frame[d1] = np.array([0.9, 0.2, 0.1]) * (0.7 + 0.3 * np.sin(20 * t))
    frame[d2] = np.array([0.1, 0.3, 0.9])
    # temporally coherent fine detail (fixed spatial noise, drifting phase)
    rng = np.random.default_rng(1234)
    noise = rng.normal(0, 1, (h // 8 + 2, w // 8 + 2)).astype(np.float32)
    ys = (np.arange(h) / 8 + 10 * t) % (h // 8)
    xs = (np.arange(w) / 8) % (w // 8)
    ni = noise[ys.astype(int)][:, xs.astype(int)]
    frame += 0.03 * ni[..., None]
    return np.clip(frame, 0, 1)


def write_video(outdir: str, frames: int, h: int, w: int) -> None:
    from PIL import Image

    os.makedirs(outdir, exist_ok=True)
    for i in range(frames):
        arr = (synth_frame(i / frames, h, w) * 255).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(outdir, f"f{i:05d}.png"))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir")
    ap.add_argument("--frames", type=int, default=132)
    ap.add_argument("--h", type=int, default=720)
    ap.add_argument("--w", type=int, default=1280)
    a = ap.parse_args()
    write_video(a.outdir, a.frames, a.h, a.w)
    print(f"wrote {a.frames} frames {a.h}x{a.w} to {a.outdir}")
