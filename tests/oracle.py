"""Independent NumPy float64 path-tracing oracle.

A from-scratch, vectorized re-implementation of the reference renderer's
semantics (/root/reference/src/renderer.zig:72-126 + camera.zig + geom.zig +
material.zig) used as the end-to-end parity oracle for the JAX renderer. It
shares NO code with rayz_tpu (pure NumPy, own RNG), so agreement between the
two is meaningful evidence of correctness. Randomness uses numpy Generator
rejection-free transforms; parity with the JAX renderer is statistical (the
reference itself seeds from OS entropy, so bit parity is impossible —
SURVEY.md §4).
"""

from __future__ import annotations

import math

import numpy as np

MAT_DIFFUSE, MAT_METALLIC, MAT_DIELECTRIC = 0, 1, 2
TEX_SOLID, TEX_CHECKER = 0, 1


def _normalize(a):
    return a / np.linalg.norm(a, axis=-1, keepdims=True)


class OracleCamera:
    """Mirror of Camera.init/getRay (camera.zig:18-77)."""

    def __init__(self, *, width, height, vfov, focus_dist, defocus_angle,
                 look_from, look_at, vup=(0, 1, 0)):
        self.w_px, self.h_px = width, height
        look_from = np.asarray(look_from, dtype=np.float64)
        look_at = np.asarray(look_at, dtype=np.float64)
        vup = np.asarray(vup, dtype=np.float64)
        deg = math.pi / 180.0
        vp_h = 2.0 * math.tan(vfov * deg / 2.0) * focus_dist
        vp_w = vp_h * width / height
        w = _normalize(look_from - look_at)
        u = _normalize(np.cross(vup, w))
        v = np.cross(w, u)
        vp_u, vp_v = u * vp_w, v * -vp_h
        self.px_du = vp_u / width
        self.px_dv = vp_v / height
        self.px_origin = (look_from - w * focus_dist - vp_u / 2 - vp_v / 2
                          + 0.5 * (self.px_du + self.px_dv))
        self.look_from = look_from
        r = math.tan(defocus_angle * deg / 2.0) * focus_dist if defocus_angle > 0 else 0.0
        self.defocus_u, self.defocus_v = u * r, v * r
        self.has_defocus = r > 0

    def rays(self, rng: np.random.Generator):
        """One jittered ray per pixel, row-major; returns (o, d, time) [R,*]."""
        ys, xs = np.meshgrid(np.arange(self.h_px), np.arange(self.w_px), indexing="ij")
        x = xs.reshape(-1) + rng.random(xs.size) - 0.5
        y = ys.reshape(-1) + rng.random(xs.size) - 0.5
        o = np.broadcast_to(self.look_from, (xs.size, 3)).copy()
        if self.has_defocus:
            # polar disk sample
            r = np.sqrt(rng.random(xs.size))
            th = rng.random(xs.size) * 2 * math.pi
            o = o + (r * np.cos(th))[:, None] * self.defocus_u \
                  + (r * np.sin(th))[:, None] * self.defocus_v
        d = x[:, None] * self.px_du + y[:, None] * self.px_dv + self.px_origin - o
        t = rng.random(xs.size)
        return o, d, t


def scene_to_numpy(scene):
    """Pull a rayz_tpu Scene into plain float64 numpy arrays."""
    g = lambda a: np.asarray(a, dtype=np.float64)
    gi = lambda a: np.asarray(a)
    return dict(
        center=g(scene.sphere_center)[: scene.n_spheres],
        velocity=g(scene.sphere_velocity)[: scene.n_spheres],
        radius=g(scene.sphere_radius)[: scene.n_spheres],
        smat=gi(scene.sphere_material)[: scene.n_spheres],
        mat_kind=gi(scene.mat_kind),
        mat_tex=gi(scene.mat_texture),
        mat_fuzz=g(scene.mat_fuzz),
        mat_ior=g(scene.mat_ior),
        tex_kind=gi(scene.tex_kind),
        tex_color=g(scene.tex_color),
        tex_scale=g(scene.tex_scale),
        tex_even=gi(scene.tex_even),
        tex_odd=gi(scene.tex_odd),
    )


def _texture_value(S, tex_idx, point):
    # chase child handles until every lane lands on a solid — the
    # reference's unbounded recursion (material.zig:37-51); builder texture
    # graphs are acyclic, so table size bounds the depth
    out = np.zeros((tex_idx.shape[0], 3))
    cur = tex_idx.copy()
    done = np.zeros(tex_idx.shape[0], dtype=bool)
    for _ in range(max(4, len(S["tex_kind"]))):
        if done.all():
            break
        kind = S["tex_kind"][cur]
        solid = (kind == TEX_SOLID) & ~done
        out[solid] = S["tex_color"][cur[solid]]
        done |= kind == TEX_SOLID
        scale = S["tex_scale"][cur]
        cells = np.floor(point / scale[:, None]).astype(np.int64)
        even = (cells.sum(axis=1) % 2) == 0
        child = np.where(even, S["tex_even"][cur], S["tex_odd"][cur])
        cur = np.where(done, cur, child)
    out[~done] = S["tex_color"][cur[~done]]
    return out


def _sky(d):
    # renderer.zig:124-125 exact form: t * ((1-t)*white + blue)
    t = 0.5 * (_normalize(d)[:, 1] + 1.0)
    t = t[:, None]
    return ((1.0 - t) + np.array([0.5, 0.7, 1.0])) * t


def _intersect(S, o, d, time, t_min):
    """Nearest sphere hit, direct offset formulation (geom.zig:38-66)."""
    c_now = S["center"][None, :, :] + time[:, None, None] * S["velocity"][None, :, :]
    offset = c_now - o[:, None, :]  # [R,N,3]
    a = (d * d).sum(axis=1)[:, None]
    hb = (d[:, None, :] * offset).sum(axis=2)
    c = (offset * offset).sum(axis=2) - S["radius"][None, :] ** 2
    disc = hb * hb - a * c
    ok = disc >= 0
    rt = np.sqrt(np.maximum(disc, 0.0))
    t1 = (hb - rt) / a
    t2 = (hb + rt) / a
    t = np.where((t1 >= t_min) & ok, t1, np.where((t2 >= t_min) & ok, t2, np.inf))
    idx = t.argmin(axis=1)
    tb = t[np.arange(t.shape[0]), idx]
    return tb, idx


def _random_in_unit_sphere(rng, n):
    v = _normalize(rng.normal(size=(n, 3)))
    return v * np.cbrt(rng.random(n))[:, None]


def render_oracle(scene, camera: OracleCamera, *, spp, max_depth, t_min,
                  seed=0):
    """Render to a linear [H, W, 3] float64 image."""
    S = scene_to_numpy(scene)
    rng = np.random.default_rng(seed)
    h, w = camera.h_px, camera.w_px
    img = np.zeros((h * w, 3))
    for _ in range(spp):
        o, d, time = camera.rays(rng)
        thr = np.ones((h * w, 3))
        rad = np.zeros((h * w, 3))
        active = np.ones(h * w, dtype=bool)
        for _ in range(max_depth):
            if not active.any():
                break
            t, idx = _intersect(S, o, d, time, t_min)
            hit = np.isfinite(t)
            miss_now = active & ~hit
            rad[miss_now] += thr[miss_now] * _sky(d[miss_now])
            act = active & hit
            if not act.any():
                active = act
                break
            # hit attributes (hit.zig:16-42, geom.zig:60-64)
            i = idx[act]
            tt = t[act]
            c_now = S["center"][i] + time[act, None] * S["velocity"][i]
            p = o[act] + tt[:, None] * d[act]
            n = _normalize(p - c_now)
            front = (n * d[act]).sum(axis=1) < 0
            n = np.where(front[:, None], n, -n)
            mat = S["smat"][i]
            kind = S["mat_kind"][mat]
            nact = act.sum()
            new_d = np.zeros((nact, 3))
            att = np.ones((nact, 3))
            scat = np.ones(nact, dtype=bool)
            # diffuse HEMISPHERE (material.zig:75-101 default method)
            dif = kind == MAT_DIFFUSE
            if dif.any():
                s = _random_in_unit_sphere(rng, int(dif.sum()))
                keep = (s * n[dif]).sum(axis=1) > 0
                s = np.where(keep[:, None], s, -s)
                target = p[dif] + s
                nz = np.all(np.abs(target) <= 1e-8, axis=1)
                target[nz] = n[dif][nz]
                new_d[dif] = target - p[dif]
                att[dif] = _texture_value(S, S["mat_tex"][mat[dif]], p[dif])
            met = kind == MAT_METALLIC
            if met.any():
                dm = d[act][met]
                nm = n[met]
                refl = dm - 2 * (dm * nm).sum(axis=1)[:, None] * nm
                refl = _normalize(refl)
                fuzz = np.minimum(S["mat_fuzz"][mat[met]], 1.0)
                refl = refl + fuzz[:, None] * _normalize(rng.normal(size=(int(met.sum()), 3)))
                new_d[met] = refl
                scat[met] = (refl * nm).sum(axis=1) > 0
                att[met] = _texture_value(S, S["mat_tex"][mat[met]], p[met])
            die = kind == MAT_DIELECTRIC
            if die.any():
                dd = d[act][die]
                nd = n[die]
                ior = S["mat_ior"][mat[die]]
                eta = np.where(front[die], 1.0 / ior, ior)
                ud = _normalize(dd)
                cos = (-ud * nd).sum(axis=1)
                sin = np.sqrt(np.maximum(1 - cos * cos, 0))
                r0 = ((1 - eta) / (1 + eta)) ** 2
                refl_p = r0 + (1 - r0) * (1 - cos) ** 5
                do_refl = (eta * sin > 1.0) | (refl_p > rng.random(int(die.sum())))
                refl = dd - 2 * (dd * nd).sum(axis=1)[:, None] * nd  # non-unit dir
                perp = (ud + cos[:, None] * nd) * eta[:, None]
                par = -np.sqrt(np.maximum(1 - (perp * perp).sum(axis=1), 0))[:, None] * nd
                refr = perp + par
                new_d[die] = np.where(do_refl[:, None], refl, refr)
            # advance
            o[act] = p
            d[act] = new_d
            thr[act] *= att
            cont = act.copy()
            cont[act] = scat
            thr[act & ~cont] = 0.0
            active = cont
        img += rad
    return (img / spp).reshape(h, w, 3)
