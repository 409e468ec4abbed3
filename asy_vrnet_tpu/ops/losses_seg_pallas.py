"""Fused Pallas TPU kernel for the segmentation losses + f_score (round 4).

The jnp formulation (ops/losses_seg.py — the oracle these kernels are tested
against) costs ~15 ms of the bs=64 train step at 512**2: the (B,H,W,C) f32
logits with C=9 lane-pad 14x in NHWC T(8,128) tiling, so XLA relays them to
channel-major layouts (2+ ms of pure layout copies), materialises the
(B,H,W,C+1) one-hot target (671 MB at bs=64), the (B,HW,C) softmax/probs
planes, and walks them once per loss term (focal + dice + f_score).

This kernel computes EVERYTHING in one pass over channel-major (C, TH, W)
tiles — log-softmax, weighted NLL (one-hot built as a class-iota compare,
never materialised in HBM), the focal sum, the dice tp/fp/fn sums and the
thresholded f_score sums — accumulating 4 scalars + 5 per-class vectors into
one (16, 128) block.  The backward recomputes the tile softmax and emits
dlogits directly from tiny per-class coefficients; no (B,H,W,C)-sized
intermediate other than dlogits itself ever touches HBM.

Semantics match the oracle exactly (same parity quirks — class weights
inside the focal exp, mean over ALL pixels, dice/f_score over every pixel's
probs but only non-ignored targets; reference nets/deeplabv3_training.py:9-59
and utils_seg/utils_metrics.py:12-31).  I/O dtype follows the logits input
(bf16 in the production train step — bit-identical values to the model's
pre-cast bf16 compute); all in-kernel arithmetic is f32.  f_score is a
metric: like the oracle's thresholded preds, its gradient is zero a.e. and
the VJP ignores its cotangent.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_NQ = 16          # accumulator sublanes

# accumulator layout: block (6, 16, 128) f32 [quantity, sublane, lane]
#   block 0, sublane 0, lanes 0..3: ce_num, ce_den, focal_sum, npix
#   blocks 1..5, sublanes 0..C-1, lane 0: per-class tp, sum_p, sum_t,
#   tp_f, sum_pred


def _softmax_tile(lt):
    """(C, TH, W) f32 logits -> (probs, lse) with class on the outer axis."""
    mx = jnp.max(lt, axis=0, keepdims=True)       # (1, TH, W)
    ex = jnp.exp(lt - mx)
    ssum = jnp.sum(ex, axis=0, keepdims=True)
    lse = mx + jnp.log(ssum)
    return ex / ssum, lse


def _seg_loss_fwd_kernel(w_ref, x_ref, t_ref, acc_ref, *, c, alpha, gamma,
                         threshold):
    from jax.experimental import pallas as pl

    f32 = jnp.float32
    lt = x_ref[0].astype(f32)                     # (C, TH, W)
    tgt = t_ref[0]                                # (TH, W) int32, ignore == C
    _, th, w = lt.shape
    probs, lse = _softmax_tile(lt)

    # one-hot as a class-iota compare; ignore pixels (tgt == C) match nothing
    ci = jax.lax.broadcasted_iota(jnp.int32, (c, th, w), 0)
    onehot = (ci == tgt[None]).astype(f32)        # (C, TH, W)
    l_t = jnp.sum(onehot * lt, axis=0)            # (TH, W)
    w_t = jnp.zeros((th, w), f32)
    for k in range(c):                            # class weights from SMEM
        w_t = w_t + w_ref[k] * onehot[k]
    nll = w_t * (lse[0] - l_t)                    # (TH, W), 0 at ignored

    # focal (parity: weights inside the exp, mean over ALL pixels)
    logpt = -nll
    pt = jnp.exp(logpt)
    om = 1.0 - pt
    focal = -(om ** gamma) * (alpha * logpt)

    # dice / f_score per-class sums (probs over ALL pixels; ignored targets
    # contribute to sum_p/sum_pred only — exactly the oracle's fp behaviour)
    preds = (probs > threshold).astype(f32)

    def csum(x3):                                 # (C, TH, W) -> (C, 1)
        return jnp.sum(jnp.sum(x3, axis=2, keepdims=True), axis=1)

    lane = jax.lax.broadcasted_iota(jnp.int32, (_NQ, 128), 1)
    scal = (
        jnp.where(lane == 0, jnp.sum(nll), 0.0)
        + jnp.where(lane == 1, jnp.sum(w_t), 0.0)
        + jnp.where(lane == 2, jnp.sum(focal), 0.0)
        + jnp.where(lane == 3, f32(th * w), 0.0)
    )                                             # (_NQ, 128), rows equal
    sub = jax.lax.broadcasted_iota(jnp.int32, (_NQ, 128), 0)
    blocks = [jnp.where(sub == 0, scal, 0.0)[None]]
    zpad = jnp.zeros((_NQ - c, 1), f32)
    for vec in (csum(onehot * probs), csum(probs), csum(onehot),
                csum(onehot * preds), csum(preds)):
        vp = jnp.concatenate([vec, zpad], axis=0)            # (_NQ, 1)
        blocks.append(jnp.where(lane == 0, vp, 0.0)[None])   # (1, _NQ, 128)
    acc = jnp.concatenate(blocks, axis=0)                    # (6, _NQ, 128)

    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    @pl.when(first)
    def _init():
        acc_ref[:] = acc

    @pl.when(jnp.logical_not(first))
    def _accum():
        acc_ref[:] += acc


def _seg_loss_bwd_kernel(w_ref, co_ref, x_ref, t_ref, dx_ref, *, c, alpha,
                         gamma, use_focal):
    """dlogits tile from saved per-class coefficients + the focal/CE chain.

    co_ref (SMEM (257,) f32): [0:c] = A_c (one-hot term of dL/dp_c from
    dice), [128:128+c] = B_c (the every-pixel term), [256] = the pixel-term
    scale of the focal/CE chain (g / npix or g / ce_den)."""
    f32 = jnp.float32
    lt = x_ref[0].astype(f32)                     # (C, TH, W)
    tgt = t_ref[0]                                # (TH, W)
    _, th, w = lt.shape
    probs, lse = _softmax_tile(lt)

    ci = jax.lax.broadcasted_iota(jnp.int32, (c, th, w), 0)
    onehot = (ci == tgt[None]).astype(f32)
    l_t = jnp.sum(onehot * lt, axis=0)
    w_t = jnp.zeros((th, w), f32)
    for k in range(c):
        w_t = w_t + w_ref[k] * onehot[k]

    # CE / focal chain; dlogpt/dl_c = w_t * (onehot_c - p_c)
    if use_focal:
        logpt = -w_t * (lse[0] - l_t)
        pt = jnp.exp(logpt)
        om = jnp.maximum(1.0 - pt, 0.0)
        # d/dlogpt of -(alpha * (1-pt)^gamma * logpt)
        dfdlogpt = -alpha * (om ** gamma
                             - gamma * pt * logpt * om ** (gamma - 1.0))
    else:
        dfdlogpt = -jnp.ones((th, w), f32)        # L_ce = -sum(logpt)/ce_den
    pixc = co_ref[256] * dfdlogpt * w_t           # (TH, W)
    dl = pixc[None] * (onehot - probs)            # (C, TH, W)

    # dice via the softmax jacobian: gp_c = A_c * onehot_c + B_c
    gp = jnp.concatenate(
        [(co_ref[k] * onehot[k] + co_ref[128 + k])[None] for k in range(c)],
        axis=0,
    )                                             # (C, TH, W)
    dot = jnp.sum(probs * gp, axis=0, keepdims=True)
    dl = dl + probs * (gp - dot)

    dx_ref[0] = dl.astype(dx_ref.dtype)


def _tile_h(h: int, w: int, c: int) -> int:
    """Rows per tile: keep the ~8 live (C, TH, W) f32 planes near 8 MB."""
    budget = max(1, (8 * 1024 * 1024) // (8 * 4 * c * w))
    th = min(h, budget)
    while h % th:
        th -= 1
    return th


@functools.partial(
    jax.jit, static_argnames=("c", "alpha", "gamma", "threshold", "interpret")
)
def _seg_sums_pallas(logits_t, target, cls_weights, c, alpha, gamma,
                     threshold, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, _, h, w = logits_t.shape
    th = _tile_h(h, w, c)
    kernel = functools.partial(_seg_loss_fwd_kernel, c=c, alpha=alpha,
                               gamma=gamma, threshold=threshold)
    return pl.pallas_call(
        kernel,
        grid=(b, h // th),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, c, th, w), lambda bi, hi: (bi, 0, hi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, w), lambda bi, hi: (bi, hi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((6, _NQ, 128), lambda bi, hi: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((6, _NQ, 128), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=b * h * w * c * 30,
            bytes_accessed=b * h * w * (c * logits_t.dtype.itemsize + 4),
            transcendentals=b * h * w * (c + 2),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(cls_weights.astype(jnp.float32), logits_t, target)


@functools.partial(
    jax.jit, static_argnames=("c", "alpha", "gamma", "use_focal", "interpret")
)
def _seg_dlogits_pallas(logits_t, target, cls_weights, coef, c, alpha, gamma,
                        use_focal, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, _, h, w = logits_t.shape
    th = _tile_h(h, w, c)
    kernel = functools.partial(_seg_loss_bwd_kernel, c=c, alpha=alpha,
                               gamma=gamma, use_focal=use_focal)
    return pl.pallas_call(
        kernel,
        grid=(b, h // th),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, c, th, w), lambda bi, hi: (bi, 0, hi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, w), lambda bi, hi: (bi, hi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, th, w), lambda bi, hi: (bi, 0, hi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(logits_t.shape, logits_t.dtype),
        cost_estimate=pl.CostEstimate(
            flops=b * h * w * c * 30,
            bytes_accessed=b * h * w * c * logits_t.dtype.itemsize * 2,
            transcendentals=b * h * w * (c + 2),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(cls_weights.astype(jnp.float32), coef, logits_t, target)


def _losses_from_acc(acc, c, use_focal, use_dice, dice_beta, dice_smooth,
                     fs_beta, fs_smooth):
    """Scalar losses + f_score from the (6, 16, 128) sums block (f32)."""
    ce_num, ce_den = acc[0, 0, 0], acc[0, 0, 1]
    focal_sum, npix = acc[0, 0, 2], acc[0, 0, 3]
    tp, sp, st = acc[1, :c, 0], acc[2, :c, 0], acc[3, :c, 0]
    tpf, spr = acc[4, :c, 0], acc[5, :c, 0]

    if use_focal:
        loss = focal_sum / npix
    else:
        loss = ce_num / jnp.maximum(ce_den, 1e-12)
    if use_dice:
        b2 = dice_beta**2
        u = (1.0 + b2) * tp + dice_smooth
        v = b2 * st + sp + dice_smooth            # denominator is tp-free
        loss = loss + 1.0 - jnp.mean(u / v)
    b2f = fs_beta**2
    uf = (1.0 + b2f) * tpf + fs_smooth
    vf = b2f * (st - tpf) + (spr - tpf) + uf      # == (1+b2)tp + b2 fn + fp + sm
    fscore = jnp.mean(uf / vf)
    return loss, fscore


@functools.partial(
    jax.custom_vjp,
    nondiff_argnums=(3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13),
)
def _fused_seg_core(logits_t, target, cls_weights, c, use_focal, alpha, gamma,
                    use_dice, dice_beta, dice_smooth, fs_beta, fs_smooth,
                    threshold, interpret):
    acc = _seg_sums_pallas(logits_t, target, cls_weights, c, alpha, gamma,
                           threshold, interpret=interpret)
    return _losses_from_acc(acc, c, use_focal, use_dice, dice_beta,
                            dice_smooth, fs_beta, fs_smooth)


def _fused_seg_core_fwd(logits_t, target, cls_weights, c, use_focal, alpha,
                        gamma, use_dice, dice_beta, dice_smooth, fs_beta,
                        fs_smooth, threshold, interpret):
    acc = _seg_sums_pallas(logits_t, target, cls_weights, c, alpha, gamma,
                           threshold, interpret=interpret)
    out = _losses_from_acc(acc, c, use_focal, use_dice, dice_beta,
                           dice_smooth, fs_beta, fs_smooth)
    return out, (logits_t, target, cls_weights, acc)


def _fused_seg_core_bwd(c, use_focal, alpha, gamma, use_dice, dice_beta,
                        dice_smooth, fs_beta, fs_smooth, threshold, interpret,
                        res, g):
    logits_t, target, cls_weights, acc = res
    gloss, _gfs = g                               # f_score grad is 0 a.e.
    gloss = jnp.asarray(gloss, jnp.float32)

    # per-class dice coefficients of dL/dp_c = A_c * onehot_c + B_c
    if use_dice:
        b2 = dice_beta**2
        tp, sp, st = acc[1, :c, 0], acc[2, :c, 0], acc[3, :c, 0]
        u = (1.0 + b2) * tp + dice_smooth
        v = b2 * st + sp + dice_smooth
        # L_dice = 1 - mean_c u/v; d/dtp = -(1+b2)/(c v); d/dsum_p = u/(c v^2)
        a_c = gloss * (-(1.0 + b2) / (c * v))
        b_c = gloss * (u / (c * v * v))
    else:
        a_c = jnp.zeros((c,), jnp.float32)
        b_c = jnp.zeros((c,), jnp.float32)
    if use_focal:
        pixscale = gloss / acc[0, 0, 3]           # / npix
    else:
        pixscale = gloss / jnp.maximum(acc[0, 0, 1], 1e-12)
    coef = jnp.zeros((257,), jnp.float32)
    coef = coef.at[:c].set(a_c).at[128 : 128 + c].set(b_c)
    coef = coef.at[256].set(pixscale)

    dlog = _seg_dlogits_pallas(logits_t, target, cls_weights, coef, c, alpha,
                               gamma, use_focal, interpret=interpret)
    return (
        dlog,
        np.zeros(target.shape, jax.dtypes.float0),
        jnp.zeros_like(cls_weights),
    )


_fused_seg_core.defvjp(_fused_seg_core_fwd, _fused_seg_core_bwd)


def fused_seg_loss_and_fscore(
    seg_logits,                  # (B, H, W, C) NHWC, any float dtype
    seg_target,                  # (B, H, W) int, ignore == num_classes
    cls_weights=None,            # (C,) or None
    num_classes: int = 21,
    *,
    use_focal: bool = True,
    focal_alpha: float = 0.5,
    focal_gamma: float = 2.0,
    use_dice: bool = True,
    dice_beta: float = 1.0,
    dice_smooth: float = 1e-5,
    fscore_beta: float = 1.0,
    fscore_smooth: float = 1e-5,
    fscore_threshold: float = 0.5,
    use_pallas: bool | None = None,
):
    """(loss_seg, f_score) — fused kernel on TPU, oracle composition elsewhere.

    Matches segmentation_loss + f_score of the oracle (ops/losses_seg.py;
    reference nets/deeplabv3_training.py:9-59, utils_seg/utils_metrics.py:
    12-31).  `use_pallas=None` selects the kernel iff on TPU; True forces it
    (interpret mode off-TPU, used by the parity tests)."""
    from asy_vrnet_tpu.ops import losses_seg as oracle

    c = seg_logits.shape[-1]
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas and seg_logits.shape[1:3] != seg_target.shape[1:3]:
        seg_logits = oracle._maybe_resize(
            seg_logits, seg_target.shape[1], seg_target.shape[2])
    if not use_pallas:
        onehot = jax.nn.one_hot(seg_target, num_classes + 1, dtype=jnp.float32)
        if use_focal:
            loss = oracle.focal_loss(seg_logits, seg_target, cls_weights,
                                     num_classes, focal_alpha, focal_gamma)
        else:
            loss = oracle.ce_loss(seg_logits, seg_target, cls_weights,
                                  num_classes)
        if use_dice:
            loss = loss + oracle.dice_loss(seg_logits, onehot, dice_beta,
                                           dice_smooth)
        return loss, oracle.f_score(seg_logits, onehot, fscore_beta,
                                    fscore_smooth, fscore_threshold)

    w = (jnp.ones((c,), jnp.float32) if cls_weights is None
         else jnp.asarray(cls_weights, jnp.float32))
    logits_t = jnp.transpose(seg_logits, (0, 3, 1, 2))        # channel-major
    loss, fscore = _fused_seg_core(
        logits_t, seg_target.astype(jnp.int32), w, c, use_focal,
        float(focal_alpha), float(focal_gamma), use_dice, float(dice_beta),
        float(dice_smooth), float(fscore_beta), float(fscore_smooth),
        float(fscore_threshold), jax.default_backend() != "tpu",
    )
    return loss, fscore
