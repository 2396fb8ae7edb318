"""Shading: lights, shadows and material evaluation (wavefront style).

Analog of src/graphics/lighting/materials.{h,cpp} and sphere-light.cpp,
re-structured for TPU: the reference's recursive Whitted evaluation
(materials.cpp:15-48, <= 8 bounces) becomes a bounded wavefront loop with
masked per-ray state — every bounce intersects the whole wavefront once and
updates throughput/irradiance with `where` selects.
"""

from __future__ import annotations

import jax.numpy as jnp

from voxel_tracer_tpu.models.scene import SceneData
from voxel_tracer_tpu.models.skydome import sample_sky
from voxel_tracer_tpu.ops import composite
from voxel_tracer_tpu.ops.math3d import BIG_F32, dot, normalize, reflect
from voxel_tracer_tpu.ops.tonemap import clamp_color

INVPI = 1.0 / jnp.pi
FOURPI = 4.0 * jnp.pi
MIN_REFLECT = 0.01  # materials.h MIN_REFLECT


def hit_point(origins, dirs, t, normal):
    """Offset intersection point (ray.h:51-53: + normal * 1e-4)."""
    return origins + dirs * t[:, None] + normal * 1e-4


def sun_light(scene: SceneData, p, n, jitter3=None, max_candidates=4):
    """Sun contribution with shadow ray (materials.cpp:226-244)."""
    sun_dir = scene.sun_dir
    if jitter3 is not None:
        intensity = 6.0 / 16.0
        sun_dir = normalize(sun_dir + jitter3 * intensity - intensity * 0.5)
    else:
        sun_dir = jnp.broadcast_to(sun_dir, p.shape)
    incidence = dot(n, sun_dir)
    lit = incidence > 0.0
    occluded, shadow_hit = composite.is_occluded(
        scene, p, sun_dir, BIG_F32, max_candidates)
    vis = lit & ~occluded
    return jnp.where(vis[:, None], scene.sun_light * incidence[:, None], 0.0)


def cos_diffuse_reflect(n, r1, r2):
    """Cosine-weighted hemisphere direction around normal n."""
    theta = jnp.arccos(jnp.sqrt(jnp.clip(1.0 - r1, 0.0, 1.0)))
    phi = 2.0 * jnp.pi * r2
    xs = jnp.sin(theta) * jnp.cos(phi)
    ys = jnp.cos(theta)
    zs = jnp.sin(theta) * jnp.sin(phi)
    # build a tangent frame: pick the axis least aligned with n
    h = jnp.where(
        (jnp.abs(n[..., 0:1]) <= jnp.abs(n[..., 1:2]))
        & (jnp.abs(n[..., 0:1]) <= jnp.abs(n[..., 2:3])),
        jnp.array([1.0, 0.0, 0.0]),
        jnp.where(
            jnp.abs(n[..., 1:2]) <= jnp.abs(n[..., 2:3]),
            jnp.array([0.0, 1.0, 0.0]),
            jnp.array([0.0, 0.0, 1.0]),
        ),
    ) + n * 0.0
    x = normalize(jnp.cross(h + n * 0.0 + 0.0, n) + 1e-12)
    z = normalize(jnp.cross(x, n))
    return normalize(xs[..., None] * x + ys[..., None] * n + zs[..., None] * z)


def ambient_light(scene: SceneData, p, n, r2pair, max_candidates=4):
    """Ambient sky term: cosine-weighted ray, occlusion within 1 unit,
    sky sample / pdf, clamped (materials.cpp:249-269)."""
    amb_dir = cos_diffuse_reflect(n, r2pair[..., 0], r2pair[..., 1])
    occluded, _ = composite.is_occluded(scene, p, amb_dir, 1.0, max_candidates)
    pdf = jnp.maximum(dot(amb_dir, n) * INVPI, 1e-6)
    sky = sample_sky(scene.sky, amb_dir) * 0.25
    contrib = clamp_color(sky / pdf[:, None], 8.0)
    return jnp.where(occluded[:, None], 0.0, contrib)


def sphere_lights(scene: SceneData, p, n, sample3, max_candidates=4):
    """Monte-Carlo spherical area lights (sphere-light.cpp:8-37)."""
    lights = scene.lights
    num = lights.origin.shape[0]
    total = jnp.zeros_like(p)
    for li in range(num):
        origin = lights.origin[li]
        radius = lights.radius[li]
        diameter = radius * 2.0
        sample_point = origin + (sample3 * diameter - radius)
        ext = sample_point - p
        dist_sqr = dot(ext, ext)
        in_aoe = dist_sqr <= lights.aoe_sqr[li]
        dist = jnp.sqrt(jnp.maximum(dist_sqr, 1e-12))
        sdir = ext / dist[:, None]
        incidence = dot(n, sdir)
        facing = incidence > 0.0
        occluded, _ = composite.is_occluded(
            scene, sample_point[None, :] * jnp.ones_like(p), -sdir,
            dist - 0.01, max_candidates)
        pdf = FOURPI * diameter
        intensity = lights.power[li] / (FOURPI * jnp.maximum(dist_sqr, 1e-12))
        contrib = lights.color[li] * (intensity * incidence * pdf)[:, None]
        ok = in_aoe & facing & ~occluded
        total = total + jnp.where(ok[:, None], contrib, 0.0)
    return total


def diffuse_irradiance(scene, p, n, noise3, noise2, config):
    """Sphere lights + sun + ambient (materials.cpp:194-221)."""
    irr = jnp.zeros_like(p)
    if scene.lights.origin.shape[0] > 0:
        irr = irr + sphere_lights(scene, p, n, noise3, config.max_candidates)
    irr = irr + sun_light(scene, p, n, noise3, config.max_candidates)
    irr = irr + ambient_light(scene, p, n, noise2, config.max_candidates)
    return irr


def lambert_irradiance(scene: SceneData, origins, dirs, hit, config):
    """Deterministic Lambertian shading: sun + shadow ray + flat ambient.
    (config-2 benchmark shading; a simplification of diffuse_light)."""
    p = hit_point(origins, dirs, hit.t, hit.normal)
    sun = sun_light(scene, p, hit.normal, None, config.max_candidates)
    return sun + config.ambient


def fresnel_reflect_prob(n1, n2, n, incident):
    """Schlick reflect probability with reflectivity floor
    (materials.cpp:271-289)."""
    r0 = ((n1 - n2) / (n1 + n2)) ** 2
    cos_x = -dot(n, incident)
    nd = n1 / n2
    sin_t2 = nd * nd * (1.0 - cos_x * cos_x)
    tir = sin_t2 > 1.0
    cos_x = jnp.where(n1 > n2, jnp.sqrt(jnp.clip(1.0 - sin_t2, 0.0, 1.0)), cos_x)
    x = 1.0 - cos_x
    ret = r0 + (1.0 - r0) * x ** 5
    ret = MIN_REFLECT + (1.0 - MIN_REFLECT) * ret
    return jnp.where((n1 > n2) & tir, 1.0, ret)


def refract(n, incident, eta):
    """Refraction direction; 0 on total internal reflection
    (materials.cpp:291-298)."""
    d = dot(n, incident)
    k = 1.0 - eta * eta * (1.0 - d * d)
    out = eta * incident - (eta * d + jnp.sqrt(jnp.clip(k, 0.0, None)))[..., None] * n
    out = normalize(out + 1e-20)
    return jnp.where((k < 0.0)[..., None], 0.0, out)


def material_row(mat):
    """Material id -> row (materials.h:8-14): row = floor((id-1)/8);
    0 glass, 1 mirror, 15 unlit; ids are 1..255 when hit."""
    return jnp.floor((mat.astype(jnp.float32) - 1.0) / 8.0).astype(jnp.int32)


def shade_full(scene: SceneData, origins, dirs, hit, frame, config):
    """Full Whitted-style wavefront shading (materials.cpp:15-48 analog).

    The recursive mirror/glass evaluation is restructured as a bounded loop:
    each bounce intersects the wavefront once; mirror rays multiply
    throughput by albedo and continue (materials.cpp:95-114); glass rays
    refract in, march to the exit with Beer absorption, then refract out
    (single refraction chain — the reference's <= 8 internal-reflection
    tree, materials.cpp:119-189, is collapsed to its dominant path with the
    Fresnel split applied as throughput).  Diffuse rays terminate with
    sphere-light + sun + ambient irradiance.
    """
    from voxel_tracer_tpu.ops.noise import sampler_3d, sampler_2d

    n = origins.shape[0]
    noise3 = sampler_3d(n, frame)
    noise2 = sampler_2d(n, frame)

    albedo_out = jnp.zeros((n, 3), jnp.float32)
    irr_out = jnp.zeros((n, 3), jnp.float32)
    throughput = jnp.ones((n, 3), jnp.float32)
    cur_o, cur_d = origins, dirs
    cur_hit = hit
    live = hit.t < BIG_F32

    for bounce in range(config.max_bounces):
        row = material_row(cur_hit.mat)
        is_unlit = (row == 15) | (cur_hit.mat == 255)
        is_glass = (row == 0) & ~is_unlit
        is_mirror = (row == 1) & ~is_unlit
        is_diffuse = live & ~(is_glass | is_mirror | is_unlit)

        p = hit_point(cur_o, cur_d, cur_hit.t, cur_hit.normal)

        # --- diffuse terminate ---------------------------------------------
        diff_mask = is_diffuse
        irr = diffuse_irradiance(scene, p, cur_hit.normal, noise3, noise2, config)
        albedo_out = jnp.where(diff_mask[:, None] & live[:, None],
                               throughput * cur_hit.albedo, albedo_out)
        irr_out = jnp.where(diff_mask[:, None] & live[:, None], irr, irr_out)

        # --- unlit terminate (laser/unlit rows, materials.cpp:23-27,39-42) -
        unlit_mask = live & is_unlit
        albedo_out = jnp.where(unlit_mask[:, None],
                               throughput * cur_hit.albedo, albedo_out)
        irr_out = jnp.where(unlit_mask[:, None], 1.0, irr_out)

        live = live & (is_mirror | is_glass)
        if bounce == config.max_bounces - 1:
            break

        # --- mirror bounce --------------------------------------------------
        mir_d = reflect(cur_d, cur_hit.normal)

        # --- glass: refract in, march to exit, refract out ------------------
        eta_in = 1.0 / 1.5
        g_in_d = refract(cur_hit.normal, cur_d, eta_in)
        glass_albedo = cur_hit.albedo

        next_d = jnp.where(is_glass[:, None], g_in_d, mir_d)
        next_o = jnp.where(is_glass[:, None],
                           cur_o + cur_d * cur_hit.t[:, None] + g_in_d * 1e-4,
                           p)
        thr_mul = jnp.where(live[:, None], cur_hit.albedo, 1.0)

        # glass interior march: find exit = distance traveled inside medium.
        # We trace from just-inside along the refracted dir; first exit from
        # the same material defines the path length for Beer's law.
        exit_hit = composite.intersect_scene(
            scene, next_o, next_d, config.max_candidates, config.max_steps)
        inside_t = jnp.where(is_glass, jnp.minimum(exit_hit.t, 10.0), 0.0)
        absorption = -(1.0 - glass_albedo)  # materials.cpp:130
        absorb = jnp.exp(absorption * 2.0 * inside_t[:, None])

        # exit refraction (glass -> air) with Fresnel weight
        exit_p = next_o + next_d * inside_t[:, None]
        exit_n = jnp.where(is_glass[:, None], exit_hit.normal, cur_hit.normal)
        g_out_d = refract(exit_n, next_d, 1.5)
        tir = jnp.sum(g_out_d * g_out_d, axis=-1) < 0.5   # refract() returned 0
        refl_prob = fresnel_reflect_prob(1.5, 1.0, next_d, exit_n)
        g_weight = (1.0 - refl_prob)

        glass_d = jnp.where(tir[:, None], reflect(next_d, exit_n), g_out_d)
        glass_o = exit_p + exit_n * 1e-4 + glass_d * 1e-4

        cur_o = jnp.where(is_glass[:, None], glass_o, next_o)
        cur_d = jnp.where(is_glass[:, None], glass_d, next_d)
        throughput = jnp.where(
            live[:, None],
            throughput * jnp.where(is_glass[:, None],
                                   absorb * jnp.where(tir[:, None], 1.0, g_weight[:, None]),
                                   thr_mul),
            throughput)

        # next intersection for surviving rays
        cur_hit = composite.intersect_scene(
            scene, cur_o, cur_d, config.max_candidates, config.max_steps)
        sky = sample_sky(scene.sky, cur_d)
        missed = cur_hit.t >= BIG_F32
        albedo_out = jnp.where((live & missed)[:, None], throughput * sky, albedo_out)
        irr_out = jnp.where((live & missed)[:, None], 1.0, irr_out)
        live = live & ~missed

    return albedo_out, irr_out
