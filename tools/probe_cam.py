"""Probe: in-loop camera math vs precomputed camera-param table.

Each bench frame rebuilds Camera.create + mega_camera inside the frame
loop — ~50 tiny (3,)-vector XLA ops whose fixed per-op cost on TPU can
rival the render kernel itself.  This probe times the same megakernel fed
from (a) in-loop camera math and (b) a precomputed (N, 29) param table
sliced per frame (still serialized: the previous frame's output texel is
added to the next frame's params at 1e-38 scale).
"""
import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_ROOT, ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

from voxel_tracer_tpu.models.camera import Camera
from voxel_tracer_tpu.models.volume import VoxelVolume
from voxel_tracer_tpu.ops.pallas import mega
from voxel_tracer_tpu.utils.timer import _force_sync

W, H, FRAMES = 1920, 1088, 128
KW = dict(tile_rows=136, tile_w=128, fine_unroll=6, fine_iters=48,
          track_steps=False, mat16=True)


def main():
    vol = VoxelVolume.noise_filled((64, 64, 64), pos=(0, 0, 0), vpu=20.0)
    mv = mega.MegaVolume(vol)
    sun = jnp.asarray([-0.619501, 0.465931, -0.631765], jnp.float32)
    traversal = sys.argv[1] if len(sys.argv) > 1 else "brick"
    kw = dict(KW, traversal=traversal)

    def cam_params(theta):
        px = 2.0 * jnp.cos(theta) + 2.4 * jnp.sin(theta)
        pz = -2.4 * jnp.cos(theta) + 2.0 * jnp.sin(theta)
        cam = Camera.create(jnp.stack([px, jnp.full_like(px, 1.4), pz]),
                            jnp.zeros(3), W / H)
        return mega.mega_camera(mv, cam, sun, W, H)

    def render(cam_p):
        rgba, _, _ = mega.render_mega_tiles(
            cam_p, mv.occ16, mv.occw16, jnp.zeros((1, 1), jnp.int32),
            mv.matw16, mv.pal, width=W, height=H, **kw,
            **mv.brick16_kw())
        return rgba[0, 0].astype(jnp.float32) * 1e-38

    @jax.jit
    def run_inloop(n):
        def body(s):
            i, c = s
            return i + 1, c + 1.0 + render(cam_params(c * 0.01))
        _, c = jax.lax.while_loop(lambda s: s[0] < n, body,
                                  (jnp.int32(0), jnp.float32(0.0)))
        return c

    cams = jax.vmap(cam_params)(jnp.arange(FRAMES, dtype=jnp.float32)
                                * 0.01)

    @jax.jit
    def run_table(n, cams):
        def body(s):
            i, c = s
            cam_p = jax.lax.dynamic_slice(cams, (i, 0),
                                          (1, cams.shape[1]))[0] + c * 1e-38
            return i + 1, 1.0 + render(cam_p)
        _, c = jax.lax.while_loop(lambda s: s[0] < n, body,
                                  (jnp.int32(0), jnp.float32(0.0)))
        return c

    nf = jnp.int32(FRAMES)
    for name, fn in (("inloop", lambda: run_inloop(nf)),
                     ("table", lambda: run_table(nf, cams))):
        out = fn(); _force_sync(out)
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            out = fn(); _force_sync(out)
            best = min(best, (time.perf_counter() - t0) / FRAMES)
        print(json.dumps({"probe": name, "traversal": traversal,
                          "ms_per_frame": round(best * 1e3, 3),
                          "mrays": round(W * H / best / 1e6, 1)}),
              flush=True)


if __name__ == "__main__":
    main()
