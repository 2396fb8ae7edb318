"""Game layer: player flight, enemy steering, laser carving, state machine."""

import numpy as np

from voxel_tracer_tpu.game.enemy import Enemy
from voxel_tracer_tpu.game.game import Game, GameState
from voxel_tracer_tpu.game.player import Input, Player
from voxel_tracer_tpu.models.scene import Scene
from voxel_tracer_tpu.models.volume import VoxelVolume
from voxel_tracer_tpu.ops.math3d import BIG_F32


def _solid_volume(n=16, mat=30, pos=(0, 0, 0)):
    g = np.full((n, n, n), mat, np.uint8)
    return VoxelVolume(g, pos=pos, vpu=20.0)


class TestPlayer:
    def test_forward_motion_and_depth_delta(self):
        p = Player()
        pos0 = p.pos.copy()
        for _ in range(30):
            pos, target, dd = p.tick(1 / 60, Input(forward=1.0))
        assert pos[2] < pos0[2]  # default yaw faces -z
        assert dd > 0.0

    def test_velocity_damping(self):
        p = Player()
        p.tick(1 / 60, Input(forward=1.0))
        v1 = np.linalg.norm(p.velocity)
        for _ in range(120):
            p.tick(1 / 60, Input())
        assert np.linalg.norm(p.velocity) < v1 * 0.1

    def test_pitch_clamped(self):
        p = Player()
        for _ in range(100):
            p.tick(1 / 60, Input(mouse_dy=-500))
        assert p.pitch <= 0.4 + 1e-6


class TestEnemy:
    def test_steers_toward_player(self):
        rng = np.random.RandomState(0)
        e = Enemy(_solid_volume(), rng)
        e.pos = np.array([10.0, 0.0, 0.0])
        player = np.zeros(3)
        d0 = np.linalg.norm(e.pos - player)
        for _ in range(120):
            e.tick(1 / 60, player, [e])
        assert np.linalg.norm(e.pos - player) < d0

    def test_hit_carves_voxel_and_kills(self):
        rng = np.random.RandomState(0)
        vol = _solid_volume(8)
        restored = []
        e = Enemy(vol, rng, reload_fn=lambda m: restored.append(True))
        e.health = 2
        solid_before = (vol.grid != 0).sum()
        # hit the +z face center
        hp = vol.pos + np.array([0.0, 0.0, -vol.size[2] / 2], np.float32)
        died = e.process_hit(hp, np.array([0, 0, -1.0], np.float32))
        assert not died
        assert (vol.grid != 0).sum() == solid_before - 1
        died = e.process_hit(hp, np.array([0, 0, -1.0], np.float32))
        assert died and restored


class TestGame:
    def _intersect(self, scene_vols):
        from voxel_tracer_tpu.ops import oracle

        ovols = [oracle.OracleVolume(grid=v.grid, vpu=v.vpu, pos=v.pos,
                                     rot=v.rot) for v in scene_vols]

        def fn(o, d, medium=0):
            if not medium:
                h = oracle.intersect_scene(ovols, o, d)
                return h.depth, h.material, h.normal
            # medium ray: per-volume query with an AABB-pretest analog —
            # the reference's BVH leaf pretest (bvh.cpp:229-233) keeps a
            # slab-missing volume's (t=0, air) medium result out of the
            # min-combine (vv.cpp:228-232)
            best = None
            for v in ovols:
                h = oracle.intersect_volume(v, o, d, medium=medium)
                if h.depth <= 0.0 and h.material == 0:
                    continue
                if best is None or h.depth < best.depth:
                    best = h
            if best is None:
                best = oracle.intersect_volume(ovols[0], o, d,
                                               medium=medium)
            return best.depth, best.material, best.normal
        return fn

    def test_state_machine_and_score(self):
        rng = np.random.RandomState(1)
        vol = _solid_volume(8, mat=30, pos=(0, 0, -3))
        enemy = Enemy(vol, rng)
        enemy.pos = np.array([0.0, 0.0, -3.0])
        vol.set_position(enemy.pos)
        scene = Scene(volumes=[vol])
        game = Game(scene, [enemy], intersect_fn=self._intersect([vol]),
                    aspect=1.0)
        assert game.state == GameState.MENU
        game.start()
        assert game.state == GameState.GAME
        # start() respawns enemies to random positions (enemy.h respawn);
        # park this one right in front of the player for the laser shot
        enemy.pos = np.array([0.0, 0.0, -3.0])
        enemy.velocity = np.zeros(3)
        vol.set_position(enemy.pos)

        # fire the laser straight ahead at the enemy volume
        solid_before = (vol.grid != 0).sum()
        game.tick(1 / 60, Input(fire=True))
        assert game.score >= 1
        assert (vol.grid != 0).sum() == solid_before - 1
        assert len(game.laser_path) >= 2
        assert game.hud_lines()

    def test_laser_medium_march_through_glass(self):
        """next_path_ray glass semantics (materials.cpp:50-69): the beam
        enters the glass box (vertex on the front face), continues as the
        SAME ray with the medium id set, and the interior march lands on
        the diffuse core inside — not on a front-face pass-through."""
        n = 16
        g = np.full((n, n, n), 3, np.uint8)      # glass row (ids 1-8)
        g[6:10, 6:10, 6:10] = 30                 # diffuse core
        vol = VoxelVolume(g, pos=(0, 0, -4), vpu=20.0)
        scene = Scene(volumes=[vol])
        game = Game(scene, [], intersect_fn=self._intersect([vol]),
                    aspect=1.0)
        game.start()
        game.tick(1 / 60, Input(fire=True))
        # [player origin, glass front face, diffuse core] — exactly 3:
        # the medium march consumes the glass in ONE segment
        assert len(game.laser_path) == 3, game.laser_path
        entry, inner = game.laser_path[1], game.laser_path[2]
        assert abs(entry[2] - (-3.6)) < 0.02, entry   # front face z
        assert -4.12 < inner[2] < -3.88, inner        # core surface z
        assert abs(inner[0]) < 0.11 and abs(inner[1]) < 0.11

    def test_laser_exits_pure_glass_into_air(self):
        """A solid glass box with nothing inside: the interior march exits
        at the back face with material air, which falls through
        next_path_ray's default case — the path terminates there
        (vv.cpp:206-232 exit semantics)."""
        n = 16
        g = np.full((n, n, n), 3, np.uint8)
        vol = VoxelVolume(g, pos=(0, 0, -4), vpu=20.0)
        scene = Scene(volumes=[vol])
        game = Game(scene, [], intersect_fn=self._intersect([vol]),
                    aspect=1.0)
        game.start()
        game.tick(1 / 60, Input(fire=True))
        assert len(game.laser_path) == 3, game.laser_path
        entry, exit_p = game.laser_path[1], game.laser_path[2]
        assert abs(entry[2] - (-3.6)) < 0.02, entry   # front face
        assert abs(exit_p[2] - (-4.4)) < 0.02, exit_p  # back face

    def test_game_over_when_caught(self):
        rng = np.random.RandomState(2)
        vol = _solid_volume(8)
        enemy = Enemy(vol, rng)
        enemy.pos = np.array([0.0, 0.0, -2.0])  # within catch radius? no
        scene = Scene(volumes=[vol])
        game = Game(scene, [enemy], aspect=1.0)
        game.start()
        enemy.pos = game.player.pos + np.array([0.1, 0.0, 0.0])
        game.tick(1 / 60, Input())
        assert game.state == GameState.GAME_OVER


class TestGameGui:
    """Menu / HUD / game-over screens (src/game/gui.h + game.cpp:103-223)."""

    def _game(self):
        vol = _solid_volume(8)
        scene = Scene(volumes=[vol])
        rng = np.random.RandomState(0)
        return Game(scene, [Enemy(vol, rng)], aspect=1.0)

    def test_menu_navigation_and_start(self):
        from voxel_tracer_tpu.game.gui import GameGui, MenuInput, draw_game_gui
        from voxel_tracer_tpu.utils.framebuffer import Surface

        game = self._game()
        gui = GameGui()
        surf = Surface(160, 120)
        # render the menu: overlay tints the (black) frame blue-ish
        draw_game_gui(surf, game, gui)
        assert game.state == GameState.MENU
        assert surf.pixels[:, :, 2].mean() > surf.pixels[:, :, 1].mean()
        # navigate down to QUIT, back up, confirm PLAY
        gui.tick(game, MenuInput(down=True))
        assert gui.focus == 1
        gui.tick(game, MenuInput(up=True))
        gui.tick(game, MenuInput(confirm=True))
        assert game.state == GameState.GAME

    def test_quit_and_game_over_screens(self):
        from voxel_tracer_tpu.game.gui import GameGui, MenuInput, draw_game_gui
        from voxel_tracer_tpu.utils.framebuffer import Surface

        game = self._game()
        gui = GameGui()
        gui.tick(game, MenuInput(down=True))
        gui.tick(game, MenuInput(confirm=True))          # QUIT
        assert gui.quit_requested

        game2 = self._game()
        gui2 = GameGui()
        game2.start()
        game2.state = GameState.GAME_OVER
        game2.score = 7
        surf = Surface(160, 120)
        draw_game_gui(surf, game2, gui2)                  # red overlay
        assert surf.pixels[:, :, 0].mean() > surf.pixels[:, :, 2].mean()
        # RETRY restarts the run
        gui2.tick(game2, MenuInput(confirm=True))
        assert game2.state == GameState.GAME
        # back to game over -> MENU button returns to menu
        game2.state = GameState.GAME_OVER
        gui2.tick(game2, MenuInput(down=True))
        gui2.tick(game2, MenuInput(confirm=True))
        assert game2.state == GameState.MENU

    def test_hud_draws_score_text(self):
        from voxel_tracer_tpu.game.gui import GameGui, draw_game_gui
        from voxel_tracer_tpu.utils.framebuffer import Surface

        game = self._game()
        game.start()
        gui = GameGui()
        surf = Surface(160, 120)
        draw_game_gui(surf, game, gui)
        assert surf.pixels.any()          # HUD glyphs landed on the frame
