"""Detection losses (`mmdet/models/losses/`): CE, binary CE, L1, smooth-L1,
GIoU, focal.  All take elementwise weights and an `avg_factor`; XLA fuses
these fine so no Pallas needed (SURVEY.md 2.9: sigmoid_focal_loss -> jnp).
"""

import jax
import math
import jax.numpy as jnp


def _reduce(loss, weight, avg_factor):
    if weight is not None:
        loss = loss * weight
    if avg_factor is None:
        return loss.mean()
    return loss.sum() / jnp.maximum(avg_factor, 1e-12)


def cross_entropy(logits, labels, weight=None, avg_factor=None):
    """Softmax CE; labels int (..., ), logits (..., C)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    return _reduce(nll, weight, avg_factor)


def binary_cross_entropy(logits, targets, weight=None, avg_factor=None):
    """Sigmoid BCE; targets float same shape as logits."""
    loss = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return _reduce(loss, weight, avg_factor)


def l1_loss(pred, target, weight=None, avg_factor=None):
    return _reduce(jnp.abs(pred - target), weight, avg_factor)


def smooth_l1_loss(pred, target, beta=1.0, weight=None, avg_factor=None):
    diff = jnp.abs(pred - target)
    loss = jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)
    return _reduce(loss, weight, avg_factor)


def giou_loss(pred, target, weight=None, avg_factor=None, eps=1e-7):
    """1 - GIoU over matched xyxy box pairs (`iou_loss.py` GIoULoss)."""
    lt = jnp.maximum(pred[..., :2], target[..., :2])
    rb = jnp.minimum(pred[..., 2:], target[..., 2:])
    wh = jnp.clip(rb - lt, 0, None)
    overlap = wh[..., 0] * wh[..., 1]
    ap = (pred[..., 2] - pred[..., 0]) * (pred[..., 3] - pred[..., 1])
    ag = (target[..., 2] - target[..., 0]) * (target[..., 3] - target[..., 1])
    union = ap + ag - overlap + eps
    iou = overlap / union
    elt = jnp.minimum(pred[..., :2], target[..., :2])
    erb = jnp.maximum(pred[..., 2:], target[..., 2:])
    ewh = jnp.clip(erb - elt, 0, None)
    enclose = ewh[..., 0] * ewh[..., 1] + eps
    giou = iou - (enclose - union) / enclose
    return _reduce(1.0 - giou, weight, avg_factor)


def sigmoid_focal_loss(logits, labels, num_classes, gamma=2.0, alpha=0.25,
                       weight=None, avg_factor=None):
    """Focal loss; labels int in [0, num_classes] (num_classes = background)."""
    t = jax.nn.one_hot(labels, num_classes, dtype=logits.dtype)
    p = jax.nn.sigmoid(logits)
    pt = p * t + (1 - p) * (1 - t)
    at = alpha * t + (1 - alpha) * (1 - t)
    bce = jnp.maximum(logits, 0) - logits * t + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    loss = at * (1 - pt) ** gamma * bce
    loss = loss.sum(-1)
    return _reduce(loss, weight, avg_factor)


def accuracy(logits, labels, mask=None):
    pred = logits.argmax(-1)
    correct = (pred == labels).astype(jnp.float32)
    if mask is not None:
        return (correct * mask).sum() / jnp.maximum(mask.sum(), 1.0)
    return correct.mean()


def ghm_c_loss(logits, labels, num_classes, bins=10, momentum=0.0,
               weight=None, avg_factor=None):
    """Gradient-Harmonizing classification loss (`ghm_loss.py` GHMC, the
    stateless variant): per-example weight = N / density(|g|) where
    g = sigmoid(p) - target, binned into `bins` gradient-norm buckets."""
    t = jax.nn.one_hot(labels, num_classes, dtype=logits.dtype)
    p = jax.nn.sigmoid(logits)
    g = jnp.abs(p - t)
    valid = jnp.ones_like(g) if weight is None else \
        jnp.broadcast_to(weight[..., None], g.shape)
    n_valid = jnp.maximum(valid.sum(), 1.0)
    edges = jnp.linspace(0.0, 1.0 + 1e-6, bins + 1)
    idx = jnp.clip(jnp.searchsorted(edges, g, side="right") - 1, 0, bins - 1)
    # bin histogram + per-element density via one-hot sums (gather/scatter
    # lower to serial loops on the TPU backend)
    onehot = (idx[..., None] == jnp.arange(bins)).astype(g.dtype)
    counts = (onehot * valid[..., None]).sum(axis=tuple(range(g.ndim)))
    density = (onehot * counts).sum(-1) * (counts > 0).sum() / n_valid
    w = jnp.where(density > 0, 1.0 / jnp.maximum(density, 1e-12), 0.0)
    bce = jnp.maximum(logits, 0) - logits * t + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    loss = (bce * w * valid).sum(-1)
    return _reduce(loss, None, avg_factor if avg_factor is not None else n_valid)


def ghm_r_loss(pred, target, mu=0.02, bins=10, weight=None, avg_factor=None):
    """Gradient-Harmonizing regression loss (`ghm_loss.py` GHMR, stateless):
    ASL1 loss sqrt(d^2 + mu^2) - mu with per-example weight equal to the
    inverse gradient-norm density, g = |d / sqrt(d^2 + mu^2)|."""
    d = pred - target
    s = jnp.sqrt(d * d + mu * mu)
    loss = s - mu
    g = jnp.abs(d / s)
    valid = jnp.ones_like(g) if weight is None else \
        jnp.broadcast_to(weight, g.shape)
    n_valid = jnp.maximum(valid.sum(), 1.0)
    edges = jnp.linspace(0.0, 1.0 + 1e-6, bins + 1)
    idx = jnp.clip(jnp.searchsorted(edges, g, side="right") - 1, 0, bins - 1)
    onehot = (idx[..., None] == jnp.arange(bins)).astype(g.dtype)
    counts = (onehot * valid[..., None]).sum(axis=tuple(range(g.ndim)))
    density = (onehot * counts).sum(-1) * (counts > 0).sum() / n_valid
    w = jnp.where(density > 0, 1.0 / jnp.maximum(density, 1e-12), 0.0)
    return _reduce(loss * w * valid, None,
                   avg_factor if avg_factor is not None else n_valid)


def iou_loss(pred, target, weight=None, avg_factor=None, eps=1e-6):
    """-log(IoU) over matched xyxy box pairs (`iou_loss.py` IoULoss)."""
    lt = jnp.maximum(pred[..., :2], target[..., :2])
    rb = jnp.minimum(pred[..., 2:], target[..., 2:])
    wh = jnp.clip(rb - lt, 0, None)
    overlap = wh[..., 0] * wh[..., 1]
    ap = (pred[..., 2] - pred[..., 0]) * (pred[..., 3] - pred[..., 1])
    ag = (target[..., 2] - target[..., 0]) * (target[..., 3] - target[..., 1])
    iou = overlap / jnp.maximum(ap + ag - overlap, eps)
    return _reduce(-jnp.log(jnp.clip(iou, eps, 1.0)), weight, avg_factor)


def balanced_l1_loss(pred, target, beta=1.0, alpha=0.5, gamma=1.5,
                     weight=None, avg_factor=None):
    """Libra R-CNN balanced L1 (`balanced_l1_loss.py`)."""
    diff = jnp.abs(pred - target)
    b = math.e ** (gamma / alpha) - 1
    loss = jnp.where(
        diff < beta,
        alpha / b * (b * diff + 1) * jnp.log1p(b * diff / beta) - alpha * diff,
        gamma * diff + gamma / b - alpha * beta)
    return _reduce(loss, weight, avg_factor)


def _bce_logits(logits, targets):
    return (jnp.maximum(logits, 0) - logits * targets
            + jnp.log1p(jnp.exp(-jnp.abs(logits))))


def quality_focal_loss(logits, labels, scores, num_classes, beta=2.0,
                       weight=None, avg_factor=None):
    """QFL (`mmdet/models/losses/gfocal_loss.py:11`): classification and
    box-quality joint supervision.  Negatives trained toward 0 with
    sigmoid^beta modulation; each positive's own class trained toward its
    quality `score` with |score - p|^beta modulation.  Fixed-shape: positive
    rows are selected with a one-hot mask instead of `nonzero` indexing.

    logits (..., C); labels int (...,) in [0, C] (C = background);
    scores float (...,).
    """
    p = jax.nn.sigmoid(logits)
    loss = _bce_logits(logits, jnp.zeros_like(logits)) * p ** beta
    pos = (labels < num_classes)
    onehot = jax.nn.one_hot(jnp.where(pos, labels, 0), num_classes,
                            dtype=logits.dtype) * pos[..., None]
    sf = jnp.abs(scores[..., None] - p)
    pos_loss = _bce_logits(logits, scores[..., None]) * sf ** beta
    loss = jnp.where(onehot > 0, pos_loss, loss).sum(-1)
    return _reduce(loss, weight, avg_factor)


def distribution_focal_loss(logits, target, weight=None, avg_factor=None):
    """DFL (`gfocal_loss.py:56`): general-distribution box regression.
    logits (..., n+1) pre-softmax over the integral set {0..n}; target float
    distances in [0, n].  CE toward the two enclosing integers, linearly
    weighted.
    """
    n = logits.shape[-1] - 1
    left = jnp.clip(jnp.floor(target), 0, n - 1).astype(jnp.int32)
    right = left + 1
    wl = right.astype(logits.dtype) - target
    wr = target - left.astype(logits.dtype)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll_l = -jnp.take_along_axis(logp, left[..., None], axis=-1)[..., 0]
    nll_r = -jnp.take_along_axis(logp, right[..., None], axis=-1)[..., 0]
    return _reduce(nll_l * wl + nll_r * wr, weight, avg_factor)


def varifocal_loss(logits, targets, alpha=0.75, gamma=2.0, iou_weighted=True,
                   weight=None, avg_factor=None):
    """Varifocal loss (`varifocal_loss.py:10`): IoU-aware classification.
    targets float (..., C) — the IoU score on the gt class, 0 elsewhere."""
    p = jax.nn.sigmoid(logits)
    pos = (targets > 0.0).astype(logits.dtype)
    neg_w = alpha * jnp.abs(p - targets) ** gamma * (1.0 - pos)
    focal = (targets * pos if iou_weighted else pos) + neg_w
    return _reduce(_bce_logits(logits, targets) * focal, weight, avg_factor)


def gaussian_focal_loss(pred, gaussian_target, alpha=2.0, gamma=4.0,
                        weight=None, avg_factor=None, eps=1e-12):
    """CornerNet-style focal loss over gaussian heatmaps
    (`gaussian_focal_loss.py:10`).  pred is post-sigmoid."""
    pos_w = (gaussian_target == 1).astype(pred.dtype)
    neg_w = (1 - gaussian_target) ** gamma
    pos = -jnp.log(pred + eps) * (1 - pred) ** alpha * pos_w
    neg = -jnp.log(1 - pred + eps) * pred ** alpha * neg_w
    return _reduce(pos + neg, weight, avg_factor)


def kd_kl_div_loss(pred, soft_logits, T=10.0, weight=None, avg_factor=None):
    """Knowledge-distillation KL (`mmdet/models/losses/kd_loss.py:11`):
    KL(softmax(teacher/T) || softmax(student/T)) * T^2, mean over the last
    axis.  Teacher is detached."""
    tgt = jax.lax.stop_gradient(jax.nn.softmax(soft_logits / T, axis=-1))
    logp = jax.nn.log_softmax(pred / T, axis=-1)
    # F.kl_div(log_q, p) = p * (log p - log q)
    kl = tgt * (jnp.log(jnp.clip(tgt, 1e-12)) - logp)
    return _reduce(kl.mean(-1) * (T * T), weight, avg_factor)


def carl_weights(cls_logits, labels, pos_mask, num_classes, k=1.0,
                 bias=0.2, sigmoid=False):
    """Classification-Aware Regression Loss weights
    (`mmdet/models/losses/pisa_loss.py:122 carl_loss`): regression loss of
    each positive scaled by (bias + (1-bias) * p_cls)^k, renormalized so
    the total stays num_pos.  Multiply into the reg loss's elementwise
    weight; the cls score keeps its gradient (that is CARL's point)."""
    lab = jnp.clip(labels, 0, num_classes - 1)
    if sigmoid:
        p = jax.nn.sigmoid(cls_logits)
    else:
        p = jax.nn.softmax(cls_logits, -1)
    pc = jnp.take_along_axis(p, lab[..., None], -1)[..., 0]
    w = (bias + (1 - bias) * pc) ** k
    w = w * pos_mask
    n = jnp.maximum(pos_mask.sum(), 1.0)
    return w * (n / jnp.maximum(w.sum(), 1e-6))


def isr_weights(ious, pos_mask, k=2.0, bias=0.0):
    """Importance-based Sample Reweighting, positive part
    (`pisa_loss.py:8 isr_p`), flattened-rank variant: positives ranked by
    IoU with their target (descending); weight = (bias + (1-bias) *
    (1 - rank/n))^k, renormalized to keep the positive loss mass.  The
    reference ranks hierarchically per (class, gt) group; with masked
    fixed-shape batches a global IoU rank is the tight equivalent."""
    n = jnp.maximum(pos_mask.sum(), 1.0)
    masked = jnp.where(pos_mask > 0, ious, -jnp.inf)
    order = jnp.argsort(-masked)
    rank = jnp.zeros_like(masked).at[order].set(
        jnp.arange(masked.shape[0], dtype=masked.dtype))
    w = (bias + (1 - bias) * (1.0 - rank / n)) ** k
    w = jnp.clip(w, 0.0) * pos_mask
    return w * (n / jnp.maximum(w.sum(), 1e-6))


def mse_loss(pred, target, weight=None, avg_factor=None):
    """`mmdet/models/losses/mse_loss.py`."""
    return _reduce((pred - target) ** 2, weight, avg_factor)


# ---------------------------------------------------------------------------
# Config-style loss registry (`mmdet/models/builder.py:63 build_loss` role):
# maps reference `type=` names to the functional losses above.  `build_loss`
# returns a partial with the config's hyper-parameters bound, so heads can
# call it as loss(pred, target, weight=..., avg_factor=...).
# ---------------------------------------------------------------------------

def _register_losses():
    import functools
    from ..models.registry import LOSSES
    if "L1Loss" in LOSSES:      # idempotent
        return

    def reg(name, fn, **bound):
        class _Cfg:                                    # closure factory
            def __new__(cls, loss_weight=1.0, **kw):
                kw = {**bound, **kw}
                kw.pop("use_sigmoid", None)
                kw.pop("reduction", None)
                base = functools.partial(fn, **kw) if kw else fn

                if loss_weight == 1.0:
                    return base

                def scaled(*a, **k):
                    return base(*a, **k) * loss_weight
                return scaled
        _Cfg.__name__ = name
        LOSSES.register(_Cfg, name=name)

    reg("CrossEntropyLoss", cross_entropy)
    reg("L1Loss", l1_loss)
    reg("SmoothL1Loss", smooth_l1_loss)
    reg("GIoULoss", giou_loss)
    reg("IoULoss", iou_loss)
    reg("FocalLoss", sigmoid_focal_loss)
    reg("GHMC", ghm_c_loss)
    reg("GHMR", ghm_r_loss)
    reg("BalancedL1Loss", balanced_l1_loss)
    reg("QualityFocalLoss", quality_focal_loss)
    reg("DistributionFocalLoss", distribution_focal_loss)
    reg("VarifocalLoss", varifocal_loss)
    reg("GaussianFocalLoss", gaussian_focal_loss)
    reg("KnowledgeDistillationKLDivLoss", kd_kl_div_loss)
    reg("MSELoss", mse_loss)


# NOTE: _register_losses() is invoked from models/__init__.py (after the
# registry module is loaded), NOT at import time here — importing the
# models package from this module would be circular when the import chain
# enters through ops.nms -> core.bbox.
