"""Sweep megakernel configs on the real chip (bench workload)."""
import itertools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp

from voxel_tracer_tpu.models.camera import Camera
from voxel_tracer_tpu.models.volume import VoxelVolume
from voxel_tracer_tpu.ops.pallas import mega
from voxel_tracer_tpu.utils.timer import _force_sync

W, H = 1920, 1088
FRAMES = 32

vol = VoxelVolume.noise_filled((64, 64, 64), pos=(0, 0, 0), vpu=20.0)
mv = mega.MegaVolume(vol)
tb = mv.tables
sun = jnp.asarray([-0.619501, 0.465931, -0.631765], jnp.float32)


def bench_cfg(**kw):
    def frame(theta):
        px = 2.0 * jnp.cos(theta) + 2.4 * jnp.sin(theta)
        pz = -2.4 * jnp.cos(theta) + 2.0 * jnp.sin(theta)
        cam = Camera.create(jnp.stack([px, jnp.full_like(px, 1.4), pz]),
                            jnp.zeros(3), W / H)
        cam_p = mega.mega_camera(mv, cam, sun, W, H)
        rgba, t, aux = mega.render_mega_tiles(
            cam_p, tb.occ, tb.occw, tb.wsm, tb.matw, mv.pal,
            bsize=tb.bsize, vpu=tb.vpu, width=W, height=H,
            track_steps=False, **kw)
        return rgba

    @jax.jit
    def run_frames():
        def body(c, i):
            rgba = frame(c * 0.01)
            return c + 1.0 + rgba[0, 0].astype(jnp.float32) * 1e-38, ()
        c, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(FRAMES))
        return c

    t0 = time.perf_counter()
    out = run_frames(); _force_sync(out)
    compile_s = time.perf_counter() - t0
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        out = run_frames(); _force_sync(out)
        best = min(best, (time.perf_counter() - t0) / FRAMES)
    rps = W * H / best
    print(json.dumps({"cfg": {k: str(v) for k, v in kw.items()},
                      "mrays": round(rps / 1e6, 1),
                      "compile_s": round(compile_s, 1)}), flush=True)
    return rps


cfgs = [
    # current bench config
    dict(tile_rows=32, tile_w=64, fine_unroll=6),
    # run-mode traversal
    dict(tile_rows=32, tile_w=64, fine_unroll=6, traversal="run",
         fine_iters=48, mat_rounds=64),
    dict(tile_rows=16, tile_w=64, fine_unroll=6, traversal="run",
         fine_iters=48, mat_rounds=64),
    # tile shape variants, brick mode
    dict(tile_rows=16, tile_w=64, fine_unroll=6),
    dict(tile_rows=8, tile_w=32, fine_unroll=6),
    dict(tile_rows=64, tile_w=128, fine_unroll=6),
    # unroll variants
    dict(tile_rows=32, tile_w=64, fine_unroll=8),
    dict(tile_rows=32, tile_w=64, fine_unroll=12),
    # slice_depth
    dict(tile_rows=32, tile_w=64, fine_unroll=6, slice_depth=2),
]
for kw in cfgs:
    try:
        bench_cfg(**kw)
    except Exception as e:
        print(json.dumps({"cfg": {k: str(v) for k, v in kw.items()},
                          "error": str(e)[:200]}), flush=True)
