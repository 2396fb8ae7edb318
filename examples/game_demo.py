"""Headless arcade-game demo (the reference's game loop without GLFW).

Simulates the drone game (src/game/) for N frames with scripted input:
enemies steer toward the player, the laser fires and carves voxels out of
enemy models (dynamic edits), kills respawn + restore grids.  Renders
snapshot frames through the kernel renderer.

Usage: python examples/game_demo.py [--frames 120] [--render-every 60]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--render-every", type=int, default=60)
    ap.add_argument("--size", default="320x192")
    ap.add_argument("--out-prefix", default="/tmp/game_frame")
    args = ap.parse_args()

    from voxel_tracer_tpu.game.enemy import Enemy
    from voxel_tracer_tpu.game.game import Game, GameState
    from voxel_tracer_tpu.game.player import Input
    from voxel_tracer_tpu.models.scene import Scene
    from voxel_tracer_tpu.models.volume import VoxelVolume
    from voxel_tracer_tpu.models.vox import load_vox
    from voxel_tracer_tpu.ops import oracle_native, oracle
    from voxel_tracer_tpu.utils.framebuffer import Surface
    from voxel_tracer_tpu.utils.timer import EmaFps, Timer

    w, h = (int(v) for v in args.size.split("x"))
    rng = np.random.RandomState(3)

    # enemy drones from the reference asset (scene.cpp:15-18)
    try:
        model = load_vox("/root/reference/assets/vox/enemy-drone.vox")
        grid, pal = model.grid, model.palette_f32
    except FileNotFoundError:
        grid = np.full((16, 16, 16), 30, np.uint8)
        pal = None

    enemies = []
    vols = []
    for i in range(4):
        vol = VoxelVolume(grid.copy(), pal, pos=(float(i), 2.0, 0.0), vpu=20.0)
        base = grid.copy()
        enemies.append(Enemy(vol, rng,
                             reload_fn=lambda m, b=base: np.copyto(m.grid, b)))
        vols.append(vol)
    scene = Scene(volumes=vols)

    def intersect(o, d, medium=0):
        """Laser scene query via the native C++ oracle (fast host-side).
        Medium rays (glass interiors) use the Python oracle — the native
        entry point has no medium flag."""
        best = (1e30, 0, np.zeros(3, np.float32))
        for v in vols:
            if medium:
                hh = oracle.intersect_volume(oracle.OracleVolume(
                    grid=v.grid, vpu=v.vpu, pos=v.pos, rot=v.rot), o, d,
                    medium=medium)
                # slab-missing volumes report (t=0, air) in medium mode
                # (vv.cpp:228-232) — the BVH AABB pretest analog drops them
                if not (hh.depth <= 0.0 and hh.material == 0) \
                        and hh.depth < best[0]:
                    best = (hh.depth, hh.material, hh.normal)
                continue
            o_l = v.rot.T @ (np.asarray(o, np.float32) - v.pos) + v.pivot
            d_l = v.rot.T @ np.asarray(d, np.float32)
            if oracle_native.available():
                r = oracle_native.trace(v.grid, v.brick_occ, v.vpu,
                                        o_l[None], d_l[None])
                t, mat, axis = float(r["t"][0]), int(r["mat"][0]), int(r["axis"][0])
                if t < best[0]:
                    sgn = -1.0 if d_l[axis] < 0 else 1.0
                    n_l = np.zeros(3, np.float32)
                    n_l[axis] = -sgn
                    best = (t, mat, v.rot @ n_l)
            else:
                hh = oracle.intersect_volume(oracle.OracleVolume(
                    grid=v.grid, vpu=v.vpu, pos=v.pos, rot=v.rot), o, d)
                if hh.depth < best[0]:
                    best = (hh.depth, hh.material, hh.normal)
        return best

    game = Game(scene, enemies, intersect_fn=intersect, aspect=w / h)
    game.start()
    # deterministic demo: park the drones ahead of the player
    for i, e in enumerate(enemies):
        e.pos = np.array([(i - 1.5) * 1.2, 0.1 * i, -5.0 - i])
        e.velocity = np.zeros(3)
        e.model.set_position(e.pos)

    fps = EmaFps()
    t_total = Timer()
    carved0 = sum((v.grid != 0).sum() for v in vols)
    for frame in range(args.frames):
        t = Timer()
        # auto-aim at the nearest enemy (demo stand-in for mouse input)
        tgt = min(enemies,
                  key=lambda e: np.linalg.norm(e.pos - game.player.pos))
        d = tgt.pos - game.player.pos
        d = d / max(np.linalg.norm(d), 1e-9)
        game.player.yaw = float(np.arctan2(-d[0], -d[2]))
        game.player.pitch = float(np.clip(np.arcsin(d[1]), -1.5, 0.4))
        inp = Input(fire=(frame % 2 == 0))
        game.tick(1 / 60, inp)
        fps.update(max(t.elapsed(), 1e-6))
        if game.state == GameState.GAME_OVER:
            print(f"frame {frame}: game over (score {game.score})")
            game.start()

    carved1 = sum((v.grid != 0).sum() for v in vols)
    print(f"simulated {args.frames} frames in {t_total.elapsed():.2f}s "
          f"(sim {fps.fps:.0f} fps)")
    print(f"score: {game.score}, voxels carved: {carved0 - carved1}")
    print(f"laser path points last frame: {len(game.laser_path)}")

    # render a final snapshot with HUD through the kernel renderer
    from voxel_tracer_tpu.ops.pallas.renderer_fast import (FastScene,
                                                           render_lambert_fast)
    cam = game.player.camera(w / h)
    fs = FastScene.build(vols)
    out = render_lambert_fast(fs, cam, w, h)
    surf = Surface(w, h).from_float(np.asarray(out["image"]))
    from voxel_tracer_tpu.game.gui import GameGui, draw_game_gui
    draw_game_gui(surf, game, GameGui())   # state-dispatched HUD/menu
    path = f"{args.out_prefix}_final.png"
    surf.save_png(path)
    print(f"wrote {path}")
    return 0 if (carved0 - carved1) > 0 else 1


if __name__ == "__main__":
    sys.exit(main())
