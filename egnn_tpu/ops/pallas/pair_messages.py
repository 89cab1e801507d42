"""Pre-gathered fused pair-message pipeline as Pallas TPU kernels (fwd+bwd).

This is the production fused path for the dense kNN EGNN layer at scale
(reference hot loop: egnn_pytorch.py:262-333). Division of labor, chosen
from measurement (v5e, n=16384/k=16/dim=32):

- XLA keeps what it is best at: the dynamic neighbor gather (~0.7 ms fwd;
  its transpose scatter-add in the backward) and the per-node projections.
- Pallas fuses everything per-PAIR: relative geometry, Fourier encoding,
  the factorized edge MLP, soft gate, coordinate-weight MLP, CoorsNorm,
  clamp, masking, and both aggregations — in VMEM. The XLA version of this
  pipeline materializes (b, n, k, 2h)-scale HBM intermediates (~136 MB for
  h1 alone at n=16384) and measured ~3 ms fwd; the kernel's HBM traffic is
  just the gathered operands in and (b, n, m)+(b, n, c) out.

Layout: pairs are I-MAJOR rows — the gathered (b, n, k, d) block is
reshaped OUTSIDE to (b, n*k, d), so in-kernel row r = i*k + t. Per-node
tensors broadcast to pairs via (ti, 1, x) -> (ti, k, x) -> (ti*k, x), and
aggregate back via the inverse reshape + sublane-axis sum. Mosaic supports
the leading-dim collapse when k is a multiple of the sublane count (8) —
enforced in ``supports_fused_pair_messages``.

Unlike ops/pallas/knn_layer.py (the earlier in-kernel one-hot-gather
variant, kept as an opt-in), there is no O(R·n) one-hot work and no n-wide
gradient accumulation: j-side gradients (d_cj, d_fj) are emitted in the
same gathered pair layout and XLA's gather-VJP scatters them — so the
kernel cost is O(n·k·h) regardless of n.

Differentiation boundary: inputs are coordinates, gathered neighbor
coordinates cj (b, n*k, c), gathered neighbor features fj (b, n*k, d),
per-node proj_i = feats @ W_i + b1 (b, n, h), and pair validity pv
(b, n*k, 1) f32 (stop-gradient). The j-side projection fj @ W_j runs
IN-kernel (measured: gathering narrow feats and projecting per-pair beats
gathering wide projections).

Pair validity ``pv`` is applied exactly as the jnp path does: messages are
masked before aggregation, coordinate weights masked before clamping
(egnn_pytorch.py:289-317); the no-mask case passes all-ones.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .knn_layer import _dsilu, _fourier, _d_fourier

_LANE = 128
_SUB = 8
# VMEM budget for live (R, h)-scale tensors per kernel invocation. The
# scoped-vmem hard limit is 16 MB; leave headroom for Mosaic's own copies.
_VMEM_BUDGET = 10 * 1024 * 1024
# Live (R, width) f32 planes, measured against Mosaic's actual stack
# allocation: the forward holds the _tile_forward intermediates (~12
# planes); the backward holds those PLUS the d_* mirror set. Calibrated
# against real scoped-vmem OOMs, not op counting: 10 planes under-counted
# 2.6x (OOM at n=16384/kc=24), then 24 planes still under-counted 2.11x
# at the same shape (observed 20.25 MB stack vs the 9.58 MB estimate,
# benchmarks/results/ab_wide.txt). 52 = 24 * 2.11 rounded up — Mosaic's
# stack allocator holds roughly double the live-set mirror again.
_FWD_PLANES = 12
_BWD_PLANES = 52


def _pick_ti(n_pad: int, k: int, h: int, m: int, d: int, c: int,
             planes: int = _BWD_PLANES) -> int:
    width = max(h, 4 * m, d, 2 * c)
    per_row = planes * width * 4
    ti = _LANE
    while ti > _SUB and (n_pad % ti or ti * k * per_row > _VMEM_BUDGET):
        ti //= 2
    return ti


def supports_fused_pair_messages(
    n: int, k: int, hidden: int, m_dim: int, dim: int,
    backend: Optional[str] = None,
) -> bool:
    """TPU-only; k must be a sublane multiple for the i-major pair reshape;
    the (ti*k, hidden) working set must fit VMEM at ti >= 8."""
    if backend is None:
        backend = jax.default_backend()
    n_pad = -(-n // _LANE) * _LANE
    return (
        backend == "tpu"
        and n >= _SUB
        and k >= _SUB
        and k % _SUB == 0
        and _pick_ti(n_pad, k, hidden, m_dim, dim, 3) >= _SUB
    )


def _bcast_pairs(x_t, ti, k):
    """(ti, x) per-node tile -> (ti*k, x) i-major pair rows."""
    return jnp.broadcast_to(x_t[:, None, :], (ti, k, x_t.shape[-1])).reshape(
        ti * k, x_t.shape[-1]
    )


def _ksum(x, ti, k):
    """(ti*k, x) i-major pair rows -> (ti, x) per-node sums."""
    return x.reshape(ti, k, x.shape[-1]).sum(axis=1)


def _mm_maker(opts):
    """MXU matmul for the MLP path. With ``mxu_bf16`` (the TPU default),
    operands are cast to bf16 with f32 accumulation — the same single-pass
    MXU mode XLA uses for f32 dots at default precision, ~6x faster than
    Mosaic's exact multi-pass f32 decomposition. Geometry (rel/dist) never
    goes through this: it is VPU f32 throughout."""
    def mm(a, b_):
        # Degenerate contractions (dim < 8) lower to broadcast-multiplies,
        # where the bf16 cast trips a Mosaic verifier bug and buys nothing —
        # keep those f32.
        prec = None
        if opts.get("mxu_bf16") and a.shape[1] >= 8:
            a, b_ = a.astype(jnp.bfloat16), b_.astype(jnp.bfloat16)
            prec = jax.lax.Precision.DEFAULT  # pin: bf16 operands ARE the scheme
        return jax.lax.dot_general(
            a, b_, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            precision=prec,
        )

    return mm


# in_specs order (shared by fwd and bwd):
# coors(tile), cj, fj, proj_i(tile), pv,
# wj, wd, w2, b2, gw, gb, cw1, cb1, cw2, cb2, scale
def _tile_forward(refs, *, k, ti, opts):
    (ci_ref, cj_ref, fj_ref, pi_ref, pv_ref,
     wj_ref, wd_ref, w2_ref, b2_ref, gw_ref, gb_ref,
     cw1_ref, cb1_ref, cw2_ref, cb2_ref, scale_ref) = refs

    mm = _mm_maker(opts)

    cj = cj_ref[0]                                  # (R, c)
    fj = fj_ref[0]                                  # (R, d)
    ci = _bcast_pairs(ci_ref[0], ti, k)             # (R, c)
    pi = _bcast_pairs(pi_ref[0], ti, k)             # (R, h)
    pv = pv_ref[0]                                  # (R, 1)

    rel = ci - cj
    dist = jnp.sum(rel * rel, axis=1, keepdims=True)       # (R, 1)
    distf = _fourier(dist, opts["fourier"])                # (R, dd)

    pj = mm(fj, wj_ref[:, :])                              # (R, h)
    h1 = pi + pj + mm(distf, wd_ref[:, :])
    s1 = h1 * jax.nn.sigmoid(h1)
    z2 = mm(s1, w2_ref[:, :]) + b2_ref[0, :]
    m0 = z2 * jax.nn.sigmoid(z2)                           # (R, m)

    if opts["soft_edges"]:
        zg = mm(m0, gw_ref[:, :]) + gb_ref[0, :]
        gate = jax.nn.sigmoid(zg)
        msg = m0 * gate
    else:
        zg = gate = None
        msg = m0

    # gate_feats_only = the sparse-path gate semantics
    # (egnn_pytorch_geometric.py:254-257): the coordinate-weight MLP consumes
    # the UNGATED messages; only the feature aggregation sees the gate.
    cmsg = m0 if opts.get("gate_feats_only") else msg
    cz1 = mm(cmsg, cw1_ref[:, :]) + cb1_ref[0, :]
    cs1 = cz1 * jax.nn.sigmoid(cz1)                        # (R, 4m)
    wz = mm(cs1, cw2_ref[:, :]) + cb2_ref[0, :]            # (R, 1)

    wm = wz * pv
    if opts["clamp"] is not None:
        cval = opts["clamp"]
        w = jnp.clip(wm, -cval, cval)
    else:
        w = wm

    if opts["norm_coors"]:
        eps = opts["eps"]
        nrm = jnp.sqrt(jnp.maximum(dist, eps * eps))
        rel_n = rel / nrm * scale_ref[0, 0]
    else:
        nrm = None
        rel_n = rel

    return dict(
        cj=cj, fj=fj, rel=rel, dist=dist, distf=distf,
        h1=h1, s1=s1, z2=z2, m0=m0, zg=zg, gate=gate, msg=msg, cmsg=cmsg,
        cz1=cz1, cs1=cs1, wz=wz, pv=pv, wm=wm, w=w, nrm=nrm, rel_n=rel_n,
    )


def _fwd_kernel(*refs, k, ti, opts):
    in_refs = refs[:16]
    out_mi_ref, out_cd_ref = refs[16], refs[17]
    t = _tile_forward(in_refs, k=k, ti=ti, opts=opts)
    out_mi_ref[0] = _ksum(t["msg"] * t["pv"], ti, k)
    out_cd_ref[0] = _ksum(t["w"] * t["rel_n"], ti, k)


def _bwd_kernel(*refs, k, ti, opts):
    in_refs = refs[:16]
    (g_mi_ref, g_cd_ref,
     d_ci_ref, d_cj_ref, d_fj_ref, d_pi_ref,
     d_wj_ref, d_wd_ref, d_w2_ref, d_b2_ref, d_gw_ref, d_gb_ref,
     d_cw1_ref, d_cb1_ref, d_cw2_ref, d_cb2_ref, d_scale_ref) = refs[16:]
    ib, ii = pl.program_id(0), pl.program_id(1)
    def dG(a, b_, dims):
        ((ca,), (cb,)), _ = dims
        prec = None
        if (opts.get("mxu_bf16")
                and a.shape[ca] >= 8 and min(a.shape) >= 8 and min(b_.shape) >= 8):
            a, b_ = a.astype(jnp.bfloat16), b_.astype(jnp.bfloat16)
            prec = jax.lax.Precision.DEFAULT  # pin: bf16 operands ARE the scheme
        return jax.lax.dot_general(a, b_, dims,
                                   preferred_element_type=jnp.float32,
                                   precision=prec)
    T_ = (((0,), (0,)), ((), ()))   # a^T @ b (contract rows)
    B_ = (((1,), (1,)), ((), ()))   # a @ b^T

    @pl.when((ib == 0) & (ii == 0))
    def _():
        for r in (d_wj_ref, d_wd_ref, d_w2_ref, d_b2_ref, d_gw_ref, d_gb_ref,
                  d_cw1_ref, d_cb1_ref, d_cw2_ref, d_cb2_ref, d_scale_ref):
            r[:, :] = jnp.zeros_like(r)

    t = _tile_forward(in_refs, k=k, ti=ti, opts=opts)
    wj_ref, wd_ref, w2_ref, gw_ref, cw1_ref, cw2_ref, scale_ref = (
        in_refs[5], in_refs[6], in_refs[7], in_refs[9], in_refs[11],
        in_refs[13], in_refs[15],
    )

    gm_b = _bcast_pairs(g_mi_ref[0], ti, k)                 # (R, m)
    gc_b = _bcast_pairs(g_cd_ref[0], ti, k)                 # (R, c)

    # ---- aggregation backward ----
    d_msg = gm_b * t["pv"]                                  # (R, m)
    d_w = jnp.sum(gc_b * t["rel_n"], axis=1, keepdims=True)  # (R, 1)
    d_rel_n = t["w"] * gc_b                                 # (R, c)

    if opts["clamp"] is not None:
        cval = opts["clamp"]
        inside = ((t["wm"] > -cval) & (t["wm"] < cval)).astype(jnp.float32)
        d_wm = d_w * inside
    else:
        d_wm = d_w
    d_wz = d_wm * t["pv"]                                   # (R, 1)

    d_dist = jnp.zeros_like(t["dist"])
    if opts["norm_coors"]:
        eps = opts["eps"]
        s = scale_ref[0, 0]
        d_rel = d_rel_n * (s / t["nrm"])
        d_nrm = jnp.sum(d_rel_n * t["rel"], axis=1, keepdims=True) * (
            -s / (t["nrm"] * t["nrm"])
        )
        live = (t["dist"] > eps * eps).astype(jnp.float32)
        d_dist = d_dist + d_nrm * live * 0.5 / t["nrm"]
        d_scale_ref[:, :] += jnp.sum(d_rel_n * t["rel"] / t["nrm"]).reshape(1, 1)
    else:
        d_rel = d_rel_n

    # coordinate-weight MLP backward (consumes cmsg: msg, or m0 when
    # gate_feats_only — see _tile_forward)
    d_cs1 = dG(d_wz, cw2_ref[:, :], B_)                     # (R, 4m)
    d_cw2_ref[:, :] += dG(t["cs1"], d_wz, T_)
    d_cb2_ref[0, :] += jnp.sum(d_wz, axis=0)
    d_cz1 = d_cs1 * _dsilu(t["cz1"])
    d_cmsg = dG(d_cz1, cw1_ref[:, :], B_)
    d_cw1_ref[:, :] += dG(t["cmsg"], d_cz1, T_)
    d_cb1_ref[0, :] += jnp.sum(d_cz1, axis=0)

    gfo = opts.get("gate_feats_only", False)
    if not gfo:
        d_msg = d_msg + d_cmsg

    # soft gate backward
    if opts["soft_edges"]:
        d_m0 = d_msg * t["gate"]
        d_g = jnp.sum(d_msg * t["m0"], axis=1, keepdims=True)
        d_zg = d_g * t["gate"] * (1.0 - t["gate"])
        d_m0 = d_m0 + dG(d_zg, gw_ref[:, :], B_)
        d_gw_ref[:, :] += dG(t["m0"], d_zg, T_)
        d_gb_ref[0, :] += jnp.sum(d_zg, axis=0)
        if gfo:
            d_m0 = d_m0 + d_cmsg   # the ungated coors-MLP branch
    else:
        # without a gate cmsg == msg == m0; the gfo split is a no-op
        d_m0 = d_msg + d_cmsg if gfo else d_msg

    # edge MLP backward
    d_z2 = d_m0 * _dsilu(t["z2"])
    d_s1 = dG(d_z2, w2_ref[:, :], B_)                       # (R, h)
    d_w2_ref[:, :] += dG(t["s1"], d_z2, T_)
    d_b2_ref[0, :] += jnp.sum(d_z2, axis=0)
    d_h1 = d_s1 * _dsilu(t["h1"])                           # (R, h)

    d_distf = dG(d_h1, wd_ref[:, :], B_)                    # (R, dd)
    d_wd_ref[:, :] += dG(t["distf"], d_h1, T_)
    d_dist = d_dist + _d_fourier(t["dist"], d_distf, opts["fourier"])

    d_rel = d_rel + 2.0 * t["rel"] * d_dist                 # (R, c)

    # j-side grads in gathered pair layout (scattered by XLA outside)
    d_fj_ref[0] = dG(d_h1, wj_ref[:, :], B_)                # (R, d)
    d_wj_ref[:, :] += dG(t["fj"], d_h1, T_)
    d_cj_ref[0] = -d_rel
    # i-side grads: band-local, direct writes
    d_ci_ref[0] = _ksum(d_rel, ti, k)
    d_pi_ref[0] = _ksum(d_h1, ti, k)


def _cst(shp):
    return pl.BlockSpec(shp, lambda ib, ii: (0,) * len(shp), memory_space=pltpu.VMEM)


def _in_specs(k, c, d, h, m, dd, ti):
    R = ti * k
    tile = lambda w: pl.BlockSpec((1, ti, w), lambda ib, ii: (ib, ii, 0),
                                  memory_space=pltpu.VMEM)
    pair = lambda w: pl.BlockSpec((1, R, w), lambda ib, ii: (ib, ii, 0),
                                  memory_space=pltpu.VMEM)
    return [
        tile(c), pair(c), pair(d), tile(h), pair(1),
        _cst((d, h)), _cst((dd, h)), _cst((h, m)), _cst((1, m)),
        _cst((m, 1)), _cst((1, 1)),
        _cst((m, 4 * m)), _cst((1, 4 * m)), _cst((4 * m, 1)), _cst((1, 1)),
        _cst((1, 1)),
    ]


def _prep_arrays(coors, cj, fj, proj_i, pv):
    b, n, c = coors.shape
    k = cj.shape[1] // n
    n_pad = -(-n // _LANE) * _LANE
    pd = n_pad - n
    f32 = lambda x: x.astype(jnp.float32)
    padn = lambda x: jnp.pad(f32(x), ((0, 0), (0, pd), (0, 0)))
    padp = lambda x: jnp.pad(f32(x), ((0, 0), (0, pd * k), (0, 0)))
    return (
        padn(coors), padp(cj), padp(fj), padn(proj_i), padp(pv), n_pad, pd,
    )


def _weights_2d(wj, wd, w2, b2, gw, gb, cw1, cb1, cw2, cb2, scale):
    f32 = lambda x: x.astype(jnp.float32)
    return (
        f32(wj), f32(wd), f32(w2), f32(b2).reshape(1, -1),
        f32(gw).reshape(w2.shape[-1], 1), f32(gb).reshape(1, 1),
        f32(cw1), f32(cb1).reshape(1, -1), f32(cw2), f32(cb2).reshape(1, 1),
        f32(scale).reshape(1, 1),
    )


@functools.partial(
    jax.jit,
    static_argnames=("fourier", "soft_edges", "norm_coors", "clamp", "eps",
                     "interpret", "mxu_bf16", "gate_feats_only"),
)
def _fwd_call(coors, cj, fj, proj_i, pv, weights, *, fourier, soft_edges,
              norm_coors, clamp, eps, interpret, mxu_bf16,
              gate_feats_only=False):
    b, n, c = coors.shape
    k = cj.shape[1] // n
    d = fj.shape[-1]
    h = proj_i.shape[-1]
    m = weights[2].shape[-1]
    dd = 2 * fourier + 1
    ci_p, cj_p, fj_p, pi_p, pv_p, n_pad, pd = _prep_arrays(
        coors, cj, fj, proj_i, pv)
    w2d = _weights_2d(*weights)
    ti = _pick_ti(n_pad, k, h, m, d, c, planes=_FWD_PLANES)
    opts = dict(fourier=fourier, soft_edges=soft_edges, norm_coors=norm_coors,
                clamp=clamp, eps=eps, mxu_bf16=mxu_bf16,
                gate_feats_only=gate_feats_only)
    kern = functools.partial(_fwd_kernel, k=k, ti=ti, opts=opts)
    m_i, cd = pl.pallas_call(
        kern,
        grid=(b, n_pad // ti),
        in_specs=_in_specs(k, c, d, h, m, dd, ti),
        out_specs=[
            pl.BlockSpec((1, ti, m), lambda ib, ii: (ib, ii, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ti, c), lambda ib, ii: (ib, ii, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n_pad, m), jnp.float32),
            jax.ShapeDtypeStruct((b, n_pad, c), jnp.float32),
        ],
        interpret=interpret,
    )(ci_p, cj_p, fj_p, pi_p, pv_p, *w2d)
    return m_i[:, :n].astype(proj_i.dtype), cd[:, :n].astype(coors.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("fourier", "soft_edges", "norm_coors", "clamp", "eps",
                     "interpret", "mxu_bf16", "gate_feats_only"),
)
def _bwd_call(coors, cj, fj, proj_i, pv, weights, g_mi, g_cd, *, fourier,
              soft_edges, norm_coors, clamp, eps, interpret, mxu_bf16,
              gate_feats_only=False):
    b, n, c = coors.shape
    k = cj.shape[1] // n
    d = fj.shape[-1]
    h = proj_i.shape[-1]
    m = weights[2].shape[-1]
    dd = 2 * fourier + 1
    ci_p, cj_p, fj_p, pi_p, pv_p, n_pad, pd = _prep_arrays(
        coors, cj, fj, proj_i, pv)
    w2d = _weights_2d(*weights)
    ti = _pick_ti(n_pad, k, h, m, d, c)
    R = ti * k
    opts = dict(fourier=fourier, soft_edges=soft_edges, norm_coors=norm_coors,
                clamp=clamp, eps=eps, mxu_bf16=mxu_bf16,
                gate_feats_only=gate_feats_only)
    padn = lambda x: jnp.pad(x.astype(jnp.float32), ((0, 0), (0, pd), (0, 0)))
    kern = functools.partial(_bwd_kernel, k=k, ti=ti, opts=opts)
    shp = jax.ShapeDtypeStruct
    tile_out = lambda w: pl.BlockSpec((1, ti, w), lambda ib, ii: (ib, ii, 0),
                                      memory_space=pltpu.VMEM)
    pair_out = lambda w: pl.BlockSpec((1, R, w), lambda ib, ii: (ib, ii, 0),
                                      memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kern,
        grid=(b, n_pad // ti),
        in_specs=_in_specs(k, c, d, h, m, dd, ti) + [tile_out(m), tile_out(c)],
        out_specs=[
            tile_out(c), pair_out(c), pair_out(d), tile_out(h),
            _cst((d, h)), _cst((dd, h)), _cst((h, m)), _cst((1, m)),
            _cst((m, 1)), _cst((1, 1)),
            _cst((m, 4 * m)), _cst((1, 4 * m)), _cst((4 * m, 1)), _cst((1, 1)),
            _cst((1, 1)),
        ],
        out_shape=[
            shp((b, n_pad, c), jnp.float32),
            shp((b, n_pad * k, c), jnp.float32),
            shp((b, n_pad * k, d), jnp.float32),
            shp((b, n_pad, h), jnp.float32),
            shp((d, h), jnp.float32), shp((dd, h), jnp.float32),
            shp((h, m), jnp.float32), shp((1, m), jnp.float32),
            shp((m, 1), jnp.float32), shp((1, 1), jnp.float32),
            shp((m, 4 * m), jnp.float32), shp((1, 4 * m), jnp.float32),
            shp((4 * m, 1), jnp.float32), shp((1, 1), jnp.float32),
            shp((1, 1), jnp.float32),
        ],
        interpret=interpret,
    )(ci_p, cj_p, fj_p, pi_p, pv_p, *w2d, padn(g_mi), padn(g_cd))

    (d_ci, d_cj, d_fj, d_pi, d_wj, d_wd, d_w2, d_b2, d_gw, d_gb,
     d_cw1, d_cb1, d_cw2, d_cb2, d_scale) = outs
    wj, wd, w2, b2, gw, gb, cw1, cb1, cw2, cb2, scale = weights
    cast = lambda g, ref: g.reshape(ref.shape).astype(ref.dtype)
    return (
        d_ci[:, :n].astype(coors.dtype),
        d_cj[:, :n * k].astype(cj.dtype),
        d_fj[:, :n * k].astype(fj.dtype),
        d_pi[:, :n].astype(proj_i.dtype),
        (cast(d_wj, wj), cast(d_wd, wd), cast(d_w2, w2), cast(d_b2, b2),
         cast(d_gw, gw), cast(d_gb, gb), cast(d_cw1, cw1), cast(d_cb1, cb1),
         cast(d_cw2, cw2), cast(d_cb2, cb2), cast(d_scale, scale)),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10, 11, 12))
def fused_pair_messages(
    coors, cj, fj, proj_i, pv, fourier: int, soft_edges: bool,
    norm_coors: bool, clamp: Optional[float], eps: float, interpret: bool,
    mxu_bf16: bool = False, gate_feats_only: bool = False,
    *weights,
):
    """Fused pre-gathered pair pipeline.

    Args:
      coors: (b, n, c) node coordinates.
      cj: (b, n*k, c) gathered neighbor coordinates, i-major rows (r = i*k+t).
      fj: (b, n*k, d) gathered neighbor features, same layout.
      proj_i: (b, n, h) i-side projection with the edge-MLP bias folded in.
      pv: (b, n*k, 1) f32 pair validity (stop-gradient; all-ones when unmasked).
      weights: (wj, wd, w2, b2, gw, gb, cw1, cb1, cw2, cb2, scale); pass
        zero-shaped dummies for unused options (gw/gb when not soft_edges,
        scale when not norm_coors) — their grads come back zero.
      gate_feats_only: sparse-path gate semantics
        (egnn_pytorch_geometric.py:254-257) — the coordinate-weight MLP
        consumes the UNGATED messages; only m_i sees the gate. The sparse
        sign convention (rel = c_j - c_i) is NOT a kernel option: negate
        coors_delta outside (autodiff flips the cotangent for free).

    Returns (m_i (b, n, m) = sum of pv-masked messages, coors_delta (b, n, c)).
    Masked-mean pooling: divide by pv counts outside.
    """
    return _fwd_call(
        coors, cj, fj, proj_i, pv, weights,
        fourier=fourier, soft_edges=soft_edges, norm_coors=norm_coors,
        clamp=clamp, eps=eps, interpret=interpret, mxu_bf16=mxu_bf16,
        gate_feats_only=gate_feats_only,
    )


def _vjp_fwd(coors, cj, fj, proj_i, pv, fourier, soft_edges, norm_coors,
             clamp, eps, interpret, mxu_bf16, gate_feats_only, *weights):
    out = _fwd_call(
        coors, cj, fj, proj_i, pv, weights,
        fourier=fourier, soft_edges=soft_edges, norm_coors=norm_coors,
        clamp=clamp, eps=eps, interpret=interpret, mxu_bf16=mxu_bf16,
        gate_feats_only=gate_feats_only,
    )
    return out, (coors, cj, fj, proj_i, pv, weights)


def _vjp_bwd(fourier, soft_edges, norm_coors, clamp, eps, interpret,
             mxu_bf16, gate_feats_only, res, g):
    coors, cj, fj, proj_i, pv, weights = res
    g_mi, g_cd = g
    d_ci, d_cj, d_fj, d_pi, d_weights = _bwd_call(
        coors, cj, fj, proj_i, pv, weights, g_mi, g_cd,
        fourier=fourier, soft_edges=soft_edges, norm_coors=norm_coors,
        clamp=clamp, eps=eps, interpret=interpret, mxu_bf16=mxu_bf16,
        gate_feats_only=gate_feats_only,
    )
    return (d_ci, d_cj, d_fj, d_pi, None) + tuple(d_weights)


fused_pair_messages.defvjp(_vjp_fwd, _vjp_bwd)
