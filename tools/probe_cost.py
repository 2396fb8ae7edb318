"""Cost-model probes for the megakernel at the bench shape.

Brackets where the 1080p frame time goes by benchmarking degenerate scenes:
  empty  — all-air volume: pays raygen + slab + rect scan + sky/tonemap
           (traversal skeleton, zero fine-DDA work)
  solid  — all-solid volume: every ray hits at its first fine step
           (skeleton + one brick visit per ray)
  noise  — the bench scene (the real workload)
  trace  — bench scene with shading='trace' (no sky/ACES/palette stage)
"""
import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(_ROOT, ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np
import jax
import jax.numpy as jnp

from voxel_tracer_tpu.models.camera import Camera
from voxel_tracer_tpu.models.volume import VoxelVolume
from voxel_tracer_tpu.ops.pallas import mega
from voxel_tracer_tpu.utils.timer import _force_sync

W, H, FRAMES = 1920, 1088, 128
TILE_ROWS, TILE_W, UNROLL = 136, 128, 6


def bench(vol, shading="flat", brick16=False):
    mv = mega.MegaVolume(vol)
    tb = mv.tables
    sun = jnp.asarray([-0.619501, 0.465931, -0.631765], jnp.float32)

    def frame(theta):
        px = 2.0 * jnp.cos(theta) + 2.4 * jnp.sin(theta)
        pz = -2.4 * jnp.cos(theta) + 2.0 * jnp.sin(theta)
        cam = Camera.create(jnp.stack([px, jnp.full_like(px, 1.4), pz]),
                            jnp.zeros(3), W / H)
        cam_p = mega.mega_camera(mv, cam, sun, W, H)
        if brick16:
            rgba, t, aux = mega.render_mega_tiles(
                cam_p, mv.occ16, mv.occw16, jnp.zeros((1, 1), jnp.int32),
                tb.matw, mv.pal, width=W, height=H,
                tile_rows=TILE_ROWS, tile_w=TILE_W, fine_unroll=UNROLL,
                fine_iters=48, track_steps=False, shading=shading,
                **mv.brick16_kw())
        else:
            rgba, t, aux = mega.render_mega_tiles(
                cam_p, tb.occ, tb.occw, tb.wsm, tb.matw, mv.pal,
                bsize=tb.bsize, vpu=tb.vpu, width=W, height=H,
                tile_rows=TILE_ROWS, tile_w=TILE_W, fine_unroll=UNROLL,
                track_steps=False, shading=shading)
        return rgba, t

    # dynamic-bound loop: a static trip count gets unrolled (see bench.py)
    @jax.jit
    def run_frames(n):
        def cond(s):
            return s[0] < n

        def body(s):
            i, c = s
            rgba, t = frame(c * 0.01)
            probe = (rgba[0, 0].astype(jnp.float32) * 1e-38
                     + t[0, 0] * 1e-38)
            return i + 1, c + 1.0 + probe

        _, c = jax.lax.while_loop(cond, body,
                                  (jnp.int32(0), jnp.float32(0.0)))
        return c

    nf = jnp.int32(FRAMES)
    out = run_frames(nf); _force_sync(out)
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        out = run_frames(nf); _force_sync(out)
        best = min(best, (time.perf_counter() - t0) / FRAMES)
    return best


def main():
    b16 = "--brick16" in sys.argv
    noise = VoxelVolume.noise_filled((64, 64, 64), pos=(0, 0, 0), vpu=20.0)
    empty = VoxelVolume(np.zeros((64, 64, 64), np.uint8), vpu=20.0)
    solid = VoxelVolume(np.full((64, 64, 64), 16, np.uint8), vpu=20.0)
    for name, vol, sh in (("empty", empty, "flat"),
                          ("solid", solid, "flat"),
                          ("noise", noise, "flat"),
                          ("trace", noise, "trace")):
        dt = bench(vol, sh, brick16=b16)
        print(json.dumps({"probe": name, "brick16": b16,
                          "ms_per_frame": round(dt * 1e3, 3),
                          "mrays": round(W * H / dt / 1e6, 1)}), flush=True)


if __name__ == "__main__":
    main()
