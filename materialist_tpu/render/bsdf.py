"""Pluggable per-pixel BSDF closures for the G-buffer tracer.

The reference's BSDF plugin hierarchy (MatDiffBSDF / TransBSDF /
MatrefractBSDF, myutils/mi_plugin.py) becomes closure factories. TPU
detail: material fetches are packed into ONE row-gather per bounce (an
(N, 8) row gather costs the same as (N, 2) on TPU, while separate scalar
gathers cost ~8 ns/element each), so the protocol is a BSDF NamedTuple of
closures:

    gather(idx)                   -> blob (..., K)  one row-gather
    eval(blob, idx, wi, wo, n)    -> (brdf (...,3), pdf (...,1))
    sample(blob, idx, u1,u2,wo,n) -> (wi, pdf, weight)
    sample_dirs(blob, u1,u2,wo,n) -> wi  (decision only — used by the
        non-differentiable trace pass, which needs directions to march
        but no BSDF values)
    weight(f, pdf)                -> throughput weight for a lobe sample
        (each BSDF's own epsilon/NaN policy, so the shade replay
        reproduces sample()'s weight exactly)

Both the NEE eval and the lobe-sample eval reuse the same blob.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from materialist_tpu.camera import Camera
from materialist_tpu.ops import brdf as B
from materialist_tpu.render.scene import Materials

PI = 3.141592653589793


class BSDF(NamedTuple):
    gather: Callable
    eval: Callable
    sample: Callable
    sample_dirs: Callable
    weight: Callable
    # packed (N, K) per-pixel table behind `gather`. At the primary bounce
    # (no film jitter) the gather is the identity map, so the shader uses
    # the table directly: the backward pass then sees a broadcast (whose
    # adjoint is a cheap sum over samples) instead of a full scatter-add.
    table: jnp.ndarray = None
    # gather_reuse(idx, primal) — differentiable gather whose forward is
    # free: the trace pass already fetched the rows (primal); only the
    # scatter-add adjoint into `table` remains. Row gathers measure
    # ~13 ns/row on TPU inside real graphs, so skipping the shade-side
    # re-fetch (forward AND its checkpoint recompute) is a major win.
    gather_reuse: Callable = None
    # semantic marker: "disney" closures may be routed to the fused
    # Pallas shade-bounce kernel (ops/pallas/shadebounce.py), which
    # hard-codes the standard-material math; anything else shades
    # through the generic XLA path.
    kind: str = "generic"


@jax.custom_vjp
def _reuse_gather(table, idx, primal):
    return primal


def _reuse_gather_fwd(table, idx, primal):
    # the table itself rides along as a residual only for shape/dtype
    # (it is a live param reference, not a copy)
    return primal, (idx, table)


def _reuse_gather_bwd(res, cot):
    idx, table = res
    from materialist_tpu.ops.pallas.rowops import (adjoint_exact,
                                                   row_scatter_add)
    # slimmed replay records (fused shade) carry only the channels the
    # kernel consumes (5 of the table's 8): zero-pad the cotangent back
    # to the table width before the scatter
    if cot.shape[-1] < table.shape[-1]:
        pad = [(0, 0)] * (cot.ndim - 1) + [(0, table.shape[-1]
                                            - cot.shape[-1])]
        cot = jnp.pad(cot, pad)
    # default fast mode: contributions round to bf16 before the f32
    # accumulation — far below the MC gradient noise at any practical spp;
    # rowops.set_adjoint_exact(True) selects the f32-payload sort variant
    g = row_scatter_add(cot, idx, table.shape[0],
                        exact=adjoint_exact()).astype(table.dtype)
    return (g, None, None)


_reuse_gather.defvjp(_reuse_gather_fwd, _reuse_gather_bwd)


def _pack(mats: Materials):
    n = mats.albedo.shape[0] * mats.albedo.shape[1]
    return jnp.concatenate([
        mats.albedo.reshape(n, 3),
        mats.roughness.reshape(n, 1),
        mats.metallic.reshape(n, 1),
        mats.normal.reshape(n, 3),
    ], axis=-1)                                  # (N, 8)


def _unpack(blob):
    return blob[..., 0:3], blob[..., 3:4], blob[..., 4:5], blob[..., 5:8]


def disney(mats: Materials):
    """Standard material BSDF (MatDiffBSDF, mi_plugin.py:1229-1475)."""
    table = _pack(mats)

    def gather_fn(idx):
        # differentiable span-binned row gather (scatter-add adjoint) —
        # the record-light shade path re-fetches rows here instead of
        # replaying bf16 records (ops/pallas/rowops.py)
        from materialist_tpu.ops.pallas.rowops import row_gather_diff
        return row_gather_diff(table, idx)

    def eval_fn(blob, idx, wi, wo, normal):
        a, r, m, _ = _unpack(blob)
        return B.eval_brdf(wi, wo, normal, a, r, m)

    def sample_fn(blob, idx, u1, u2, wo, normal):
        a, r, m, _ = _unpack(blob)
        return B.sample_brdf(u1, u2, wo, normal, a, r, m)

    def sample_dirs_fn(blob, u1, u2, wo, normal):
        _, r, _, _ = _unpack(blob)
        return B.sample_dirs(u1, u2, wo, normal, r)

    def weight_fn(f, pdf):
        pdf_det = jax.lax.stop_gradient(pdf)
        w = f / (pdf_det + 1e-6)
        w = jnp.where(pdf_det > 1e-6, w, 0.0)
        return jnp.nan_to_num(w, nan=0.0, posinf=0.0, neginf=0.0)

    return BSDF(gather_fn, eval_fn, sample_fn, sample_dirs_fn, weight_fn,
                table, lambda idx, primal: _reuse_gather(table, idx, primal),
                kind="disney")


def transparent(mats: Materials, bg, mask, spec_trans, ior, cam: Camera,
                positions, refract_distance: float = 1.0):
    """Transparency-editing BSDF (TransBSDF, mi_plugin.py:1477-1770).

    Inside ``mask``: Disney diffuse + metal lobe scaled by (1-specTrans)
    plus a glass lobe whose transmission fetches the *background image* at
    a doubly-refracted screen coordinate (the reference's screen-space
    refraction trick, mi_plugin.py:1503-1519). Outside: the original BSDF.

    positions: (N, 3) world positions per pixel (for the refraction
    reprojection). refract_distance: 1.0, or 100 when keep_albedo_color
    (mi_plugin.py:1486).
    """
    n = mats.albedo.shape[0] * mats.albedo.shape[1]
    # pack bg + mask + positions alongside the material channels so the
    # whole state is one row-gather: [a3, r, m, n3, bg3, mask1, pos3]
    table = jnp.concatenate([
        _pack(mats),
        bg.reshape(n, 3),
        mask.reshape(n, 1).astype(jnp.float32),
        positions.reshape(n, 3),
    ], axis=-1)                                  # (N, 15)
    bg_flat = bg.reshape(n, 3)
    w_img = mats.albedo.shape[1]
    h_img = mats.albedo.shape[0]

    def gather_fn(idx):
        from materialist_tpu.ops.pallas.rowops import row_gather_diff
        return row_gather_diff(table, idx)

    def refract_dir(wi, normal, eta_ratio):
        """Snell refraction (mi_plugin.py:1494-1501); wi points away."""
        cos_i = B.dot(wi, normal)
        sin2_t = eta_ratio ** 2 * jnp.maximum(0.0, 1.0 - cos_i ** 2)
        cos_t = jnp.sqrt(jnp.clip(1.0 - sin2_t, 0.0, 1.0))
        d = eta_ratio * (normal * cos_i - wi) - normal * cos_t
        return B.normalize(d)

    def refracted_index(pos, wi, normal):
        """Double refraction → screen coord → flat index
        (mi_plugin.py:1503-1519)."""
        eta = 1.0 / ior  # entering the medium
        d1 = refract_dir(wi, normal, eta)
        p1 = pos + 0.3 * refract_distance * d1
        d2 = refract_dir(-d1, normal, ior)
        p2 = p1 + refract_distance * d2
        uv = cam.project(p2)
        ui = jnp.clip(jnp.floor(uv[..., 0] + 0.5).astype(jnp.int32), 0,
                      w_img - 1)
        vi = jnp.clip(jnp.floor(uv[..., 1] + 0.5).astype(jnp.int32), 0,
                      h_img - 1)
        return vi * w_img + ui

    def eval_fn(blob, idx, wi, wo, normal):
        alb, rough, metal, _ = _unpack(blob)
        in_mask_f = blob[..., 11:12]
        in_mask = in_mask_f > 0.5
        pos = blob[..., 12:15]
        ridx = jnp.where(in_mask[..., 0],
                         refracted_index(pos, wo, normal), idx)
        bg_col = bg_flat[ridx]

        h = B.normalize(wi + wo)
        no_l = jnp.maximum(B.dot(normal, wi), 0.0)
        no_v = jnp.maximum(B.dot(normal, wo), 0.0)
        vo_h = jnp.maximum(B.dot(wo, h), 0.0)
        no_h = jnp.maximum(B.dot(normal, h), 0.0)
        lo_h = jnp.maximum(B.dot(wi, h), 0.0)

        d = B.d_ggx(no_h, rough)
        pdf = 0.5 * d / (4 * jnp.maximum(vo_h, 1e-4)) * no_h \
            + 0.5 * no_l / PI
        g = B.g_smith(no_v, no_l, rough)

        # original Disney BRDF (outside mask)
        base_d = alb * (1 - metal)
        f_d90 = 0.5 + 2 * vo_h ** 2 * rough
        f_out = 1 + (f_d90 - 1) * (1 - no_v) ** 5
        f_in = 1 + (f_d90 - 1) * (1 - no_l) ** 5
        brdf_ori = base_d / PI * f_out * f_in * no_l
        c0 = (1 - metal) * 0.04 + metal * alb
        f_m = c0 + (1 - c0) * (1 - vo_h) ** 5
        brdf_ori = brdf_ori + d * g * f_m / 4 * no_l

        # edited glass BSDF (inside mask, mi_plugin.py:1690-1716)
        kd = alb * (1 - metal) * (1 - spec_trans)
        base_glass = (1 - metal) * bg_col * spec_trans
        brdf_diff = kd / PI * no_l
        brdf_metal = d * g * f_m / 4.0 * no_l
        hw_in = 1.0 / (lo_h + 1e-6)
        hw_out = 1.0 / (vo_h + 1e-6)
        nw_in = 1.0 / (no_l + 1e-6)
        nw_out = 1.0 / (no_v + 1e-6)
        r_s = (hw_in - ior * hw_out) / (hw_in + ior * hw_out)
        r_p = (ior * hw_in - hw_out) / (ior * hw_in + hw_out)
        f_glass = 0.5 * (r_s ** 2 + r_p ** 2)
        d_hack = B.d_ggx(no_h, jnp.ones_like(rough))
        btdf = jnp.sqrt(jnp.maximum(base_glass, 0.0)) * g * d_hack \
            * (1 - f_glass) * (ior ** 2 * hw_in * hw_out) \
            / (nw_in * nw_out * (ior * hw_in + hw_out) ** 2)
        brdf_spec_edit = base_glass * d * g / (4 * nw_in)
        sign = no_l * no_v
        f_glass_lobe = jnp.where(sign > 0, brdf_spec_edit, btdf)
        bsdf_edit = brdf_diff + brdf_metal + f_glass_lobe

        bsdf = jnp.where(in_mask, bsdf_edit, brdf_ori)
        bsdf = jnp.maximum(bsdf, 0.0)
        pdf = jnp.maximum(pdf, 0.0)
        return jnp.nan_to_num(bsdf), jnp.nan_to_num(pdf)

    def sample_dirs_fn(blob, u1, u2, wo, normal):
        # lobe selection identical to the base plugin (mi_plugin.py:1602-1607)
        _, rough, _, _ = _unpack(blob)
        wi_d = B.sample_diffuse(u2, normal)
        wi_s = B.sample_ggx(u2, rough, wo, normal)
        return jnp.where((u1 > 0.5)[..., None], wi_d, wi_s)

    def weight_fn(f, pdf):
        pdf = jax.lax.stop_gradient(pdf)
        return jnp.nan_to_num(jnp.where(pdf > 1e-6, f / (pdf + 1e-4), 0.0))

    def sample_fn(blob, idx, u1, u2, wo, normal):
        wi = sample_dirs_fn(blob, u1, u2, wo, normal)
        f, pdf = eval_fn(blob, idx, wi, wo, normal)
        pdf = jax.lax.stop_gradient(pdf)
        return wi, pdf, weight_fn(f, pdf)

    return BSDF(gather_fn, eval_fn, sample_fn, sample_dirs_fn, weight_fn,
                table, lambda idx, primal: _reuse_gather(table, idx, primal))
