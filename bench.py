"""Benchmark: sustained primary rays/s at 1080p on one chip (BASELINE.md).

Scene: dense 64^3 noise volume (BASELINE.json config 1 content — the
WORST case for brick skipping: every brick occupied) with an orbiting
full-coverage camera, rendered by the fused Pallas megakernel
(voxel_tracer_tpu/ops/pallas/mega.py: raygen + two-level DDA + material +
palette + sky + ACES tonemap in one kernel, RGBA8 out).

Measures a sustained on-device frame loop: K frames per jit call via a
dynamic-bound `lax.while_loop`, each with a different camera, each
consuming the previous frame's output (serialized, no cross-frame CSE).
This is how a real interactive/training loop runs on TPU — one dispatch,
many frames — and it excludes the experimental axon tunnel's ~60 ms
per-dispatch round trip, which is a harness artifact, not framework cost
(a local TPU runtime dispatches in ~100 us).  The frame count is a traced
argument on purpose: with a static trip count XLA unrolls the loop and
Mosaic recompiles the megakernel once per iteration (128 frames -> >10 min
compile); the dynamic bound keeps it one kernel, ~80 s cold compile.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

vs_baseline is measured against the 1 Grays/s north-star target
(BASELINE.json — the reference publishes no numbers of its own).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

# megakernel tuning for the bench workload (see mega.py docstring):
# 16^3 super-brick span-scanning traversal (traversal='hier3':
# per-axis pack_mega16_axes word tables lay the tile's major axis as the
# fastest bit axis, so each fine step bit-scans the ray's whole
# 16-voxel k-run via the f32 exponent and either resolves the hit in
# the current (u,v) column or advances a column), in-brick mat16
# material resolve, 128x136-px tiles.  v5e sweep at 128
# frames/dispatch: brick16 incremental 743-757, hier (4^3 sub-block
# skips) 776-811, hier3 868-889 Mrays/s; fine_unroll 4 > 3/6.  1024
# frames/dispatch amortizes the axon tunnel's ~50 ms dispatch round
# trip to <0.1 ms/frame.
TILE_ROWS = 136
TILE_W = 128
FINE_UNROLL = 4
FINE_ITERS = 48
FRAMES_PER_DISPATCH = 1024


def main():
    import jax
    import jax.numpy as jnp

    from voxel_tracer_tpu.models.camera import Camera
    from voxel_tracer_tpu.models.volume import VoxelVolume
    from voxel_tracer_tpu.ops.pallas import mega
    from voxel_tracer_tpu.utils.timer import _force_sync

    width, height = 1920, 1088  # 1080p-class, multiple of the ray tile
    vol = VoxelVolume.noise_filled((64, 64, 64), pos=(0, 0, 0), vpu=20.0)
    mv = mega.MegaVolume(vol)
    occw3 = mv.ensure_axes()   # per-axis span-scan tables (host-packed)
    tb = mv.tables
    sun = jnp.asarray([-0.619501, 0.465931, -0.631765], jnp.float32)

    def cam_params(theta):
        px = 2.0 * jnp.cos(theta) + 2.4 * jnp.sin(theta)
        pz = -2.4 * jnp.cos(theta) + 2.0 * jnp.sin(theta)
        cam = Camera.create(jnp.stack([px, jnp.full_like(px, 1.4), pz]),
                            jnp.zeros(3), width / height)
        return mega.mega_camera(mv, cam, sun, width, height)

    def frame(cam_p):
        rgba, t, aux = mega.render_mega_tiles(
            cam_p, mv.occ16, occw3, jnp.zeros((1, 1), jnp.int32),
            mv.matw16, mv.pal, width=width, height=height,
            tile_rows=TILE_ROWS, tile_w=TILE_W, fine_unroll=FINE_UNROLL,
            fine_iters=FINE_ITERS, track_steps=False, mat16=True,
            traversal="hier3", **mv.brick16_kw())
        return rgba

    @jax.jit
    def run_frames(n):
        # all frame cameras in ONE vectorized op up front: the ~dozen tiny
        # XLA camera ops per frame otherwise cost ~0.15 ms each iteration
        cam_all = jax.vmap(cam_params)(
            jnp.arange(FRAMES_PER_DISPATCH, dtype=jnp.float32) * 0.01)

        def cond(s):
            return s[0] < n

        def body(s):
            i, c = s
            # the +c*1e-38 feeds the previous frame's output into this
            # frame's camera: serializes frames, defeats cross-frame CSE.
            # i wraps so any n > FRAMES_PER_DISPATCH reuses cameras
            # round-robin instead of silently re-timing the last one.
            cp = jax.lax.dynamic_index_in_dim(
                cam_all, i % FRAMES_PER_DISPATCH, keepdims=False) + c * 1e-38
            rgba = frame(cp)
            return i + 1, c + 1.0 + rgba[0, 0].astype(jnp.float32) * 1e-38

        _, c = jax.lax.while_loop(cond, body,
                                  (jnp.int32(0), jnp.float32(0.0)))
        return c

    n = jnp.int32(FRAMES_PER_DISPATCH)
    out = run_frames(n)
    _force_sync(out)

    rounds = 3
    t0 = time.perf_counter()
    for _ in range(rounds):
        out = run_frames(n)
        _force_sync(out)
    dt = (time.perf_counter() - t0) / (rounds * FRAMES_PER_DISPATCH)

    n_rays = width * height
    rays_per_s = n_rays / dt
    target = 1e9  # >= 1 Grays/s north star
    print(json.dumps({
        "metric": "primary_rays_per_s_1080p",
        "value": round(rays_per_s),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_s / target, 4),
    }))


if __name__ == "__main__":
    main()
