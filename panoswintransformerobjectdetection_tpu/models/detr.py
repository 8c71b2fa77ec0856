"""DETR: end-to-end set-prediction detector.

Covers the reference's `detr.py` detector + `transformer_head.py` +
`mmdet/models/utils/transformer.py` / `positional_encoding.py`: ResNet C5
-> 1x1 proj -> sine positional encoding -> 6-enc/6-dec transformer with
learned object queries -> class (C+1 softmax) + 3-layer box MLP (cxcywh,
sigmoid).  Hungarian matching (`mmdet/core/bbox/assigners/
hungarian_assigner.py` role) runs scipy's exact solver through
`jax.pure_callback` — tiny (Q x G) problems, host round-trip per step is
negligible next to the network.
"""

from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..core import losses
from ..core.bbox import bbox_overlaps
from ..ops.nms import DetResult, NEG_INF
from .layers import trunc_init, resolve_dtype
from .registry import BACKBONES, DETECTORS, build


def sine_positional_encoding(h: int, w: int, dim: int,
                             temperature: float = 10000.0) -> np.ndarray:
    """(h, w, dim) sine embedding (`SinePositionalEncoding`), static numpy."""
    half = dim // 2
    y = np.arange(h, dtype=np.float32)[:, None, None] + 1.0
    x = np.arange(w, dtype=np.float32)[None, :, None] + 1.0
    scale = 2 * np.pi
    y = y / h * scale
    x = x / w * scale
    t = temperature ** (2 * (np.arange(half, dtype=np.float32) // 2) / half)
    pe_x = x / t
    pe_y = y / t
    pe_x = np.stack([np.sin(pe_x[..., 0::2]), np.cos(pe_x[..., 1::2])],
                    -1).reshape(1, w, half)
    pe_y = np.stack([np.sin(pe_y[..., 0::2]), np.cos(pe_y[..., 1::2])],
                    -1).reshape(h, 1, half)
    pe = np.concatenate([np.broadcast_to(pe_y, (h, w, half)),
                         np.broadcast_to(pe_x, (h, w, half))], -1)
    return pe.astype(np.float32)


class MHSA(nn.Module):
    dim: int
    heads: int = 8

    @nn.compact
    def __call__(self, q, k, v):
        h = self.heads
        hd = self.dim // h
        B, Nq, _ = q.shape
        Nk = k.shape[1]
        qp = nn.Dense(self.dim, name="q")(q).reshape(B, Nq, h, hd)
        kp = nn.Dense(self.dim, name="k")(k).reshape(B, Nk, h, hd)
        vp = nn.Dense(self.dim, name="v")(v).reshape(B, Nk, h, hd)
        a = jnp.einsum("bqhd,bkhd->bhqk", qp, kp,
                       preferred_element_type=jnp.float32) * hd ** -0.5
        a = jax.nn.softmax(a, axis=-1)
        o = jnp.einsum("bhqk,bkhd->bqhd", a.astype(vp.dtype), vp)
        return nn.Dense(self.dim, name="proj")(o.reshape(B, Nq, self.dim))


class EncoderLayer(nn.Module):
    dim: int
    ffn_dim: int = 2048

    @nn.compact
    def __call__(self, x, pos):
        y = MHSA(self.dim, name="self_attn")(x + pos, x + pos, x)
        x = nn.LayerNorm(name="norm1")(x + y)
        f = nn.Dense(self.dim, name="ffn2")(
            nn.relu(nn.Dense(self.ffn_dim, name="ffn1")(x)))
        return nn.LayerNorm(name="norm2")(x + f)


class DecoderLayer(nn.Module):
    dim: int
    ffn_dim: int = 2048

    @nn.compact
    def __call__(self, q, mem, qpos, mpos):
        y = MHSA(self.dim, name="self_attn")(q + qpos, q + qpos, q)
        q = nn.LayerNorm(name="norm1")(q + y)
        y = MHSA(self.dim, name="cross_attn")(q + qpos, mem + mpos, mem)
        q = nn.LayerNorm(name="norm2")(q + y)
        f = nn.Dense(self.dim, name="ffn2")(
            nn.relu(nn.Dense(self.ffn_dim, name="ffn1")(q)))
        return nn.LayerNorm(name="norm3")(q + f)


def hungarian_match(cost: jnp.ndarray) -> jnp.ndarray:
    """cost: (B, Q, G) -> col index assigned to each row, -1 if unassigned.
    Exact scipy solver via pure_callback (host; Q,G tiny)."""
    B, Q, G = cost.shape

    def _solve(c):
        from scipy.optimize import linear_sum_assignment
        out = np.full((c.shape[0], c.shape[1]), -1, np.int32)
        for b in range(c.shape[0]):
            r, col = linear_sum_assignment(c[b])
            out[b, r] = col.astype(np.int32)
        return out

    return jax.pure_callback(
        _solve, jax.ShapeDtypeStruct((B, Q), jnp.int32), cost, vmap_method="sequential")


def boxes_cxcywh_to_xyxy(b):
    cx, cy, w, h = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)


@DETECTORS.register
class DETR(nn.Module):
    backbone: Any
    num_classes: int = 80
    num_queries: int = 100
    dim: int = 256
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    aux_loss: bool = True
    cls_weight: float = 1.0
    bbox_weight: float = 5.0
    giou_weight: float = 2.0
    bg_cls_weight: float = 0.1
    compute_dtype: Any = None

    def setup(self):
        self.backbone_m = build(BACKBONES, dict(self.backbone))
        self.input_proj = nn.Dense(self.dim, name="input_proj")
        self.query_embed = self.param("query_embed", trunc_init,
                                      (self.num_queries, self.dim))
        self.enc_layers = [EncoderLayer(self.dim, name=f"enc_{i}")
                           for i in range(self.num_encoder_layers)]
        self.dec_layers = [DecoderLayer(self.dim, name=f"dec_{i}")
                           for i in range(self.num_decoder_layers)]
        self.class_head = nn.Dense(self.num_classes + 1, name="class_head")
        self.bbox_head = [nn.Dense(self.dim, name="bbox_fc0"),
                          nn.Dense(self.dim, name="bbox_fc1"),
                          nn.Dense(4, name="bbox_fc2")]

    def _forward_transformer(self, images, train):
        feats = self.backbone_m(images, train=train)
        c5 = feats[-1]                                   # (B, h, w, C)
        B, h, w, _ = c5.shape
        mem = self.input_proj(c5.reshape(B, h * w, -1))
        pos = jnp.asarray(sine_positional_encoding(h, w, self.dim)
                          ).reshape(1, h * w, self.dim)
        for layer in self.enc_layers:
            mem = layer(mem, pos)
        q = jnp.zeros((B, self.num_queries, self.dim), mem.dtype)
        qpos = jnp.broadcast_to(self.query_embed[None], q.shape)
        outs = []
        for layer in self.dec_layers:
            q = layer(q, mem, qpos, pos)
            outs.append(q)
        return outs

    def _heads(self, q):
        cls = self.class_head(q)
        b = q
        b = nn.relu(self.bbox_head[0](b))
        b = nn.relu(self.bbox_head[1](b))
        boxes = jax.nn.sigmoid(self.bbox_head[2](b))     # cxcywh in [0,1]
        return cls, boxes

    def __call__(self, images, train: bool = False):
        outs = self._forward_transformer(images, train)
        return self._heads(outs[-1])

    def _layer_loss(self, cls, boxes, gt_boxes_n, gt_labels, gt_valid):
        """One decoder layer's Hungarian-matched loss.  gt_boxes_n is
        normalized xyxy in [0, 1]."""
        B, Q, _ = cls.shape
        G = gt_boxes_n.shape[1]
        prob = jax.nn.softmax(cls, -1)
        boxes_xyxy = boxes_cxcywh_to_xyxy(boxes)

        cost_cls = -jnp.take_along_axis(
            prob[:, :, None, :].repeat(G, 2),
            gt_labels[:, None, :, None].repeat(Q, 1), -1)[..., 0]
        cost_l1 = jnp.abs(boxes[:, :, None, :] -
                          jnp.stack([
                              (gt_boxes_n[..., 0] + gt_boxes_n[..., 2]) / 2,
                              (gt_boxes_n[..., 1] + gt_boxes_n[..., 3]) / 2,
                              gt_boxes_n[..., 2] - gt_boxes_n[..., 0],
                              gt_boxes_n[..., 3] - gt_boxes_n[..., 1]], -1
                          )[:, None, :, :]).sum(-1)
        iou = jax.vmap(bbox_overlaps)(boxes_xyxy, gt_boxes_n)
        cost = (self.cls_weight * cost_cls + self.bbox_weight * cost_l1 -
                self.giou_weight * iou)
        cost = jnp.where(gt_valid[:, None, :], cost, 1e6)
        cost = jax.lax.stop_gradient(cost)
        assign = hungarian_match(cost)                   # (B, Q) col or -1
        matched_valid = jnp.take_along_axis(
            gt_valid, jnp.clip(assign, 0), 1) & (assign >= 0)

        gidx = jnp.clip(assign, 0)
        tgt_label = jnp.where(matched_valid,
                              jnp.take_along_axis(gt_labels, gidx, 1),
                              self.num_classes)
        w_cls = jnp.where(tgt_label == self.num_classes,
                          self.bg_cls_weight, 1.0)
        loss_cls = losses.cross_entropy(cls, tgt_label, weight=w_cls,
                                        avg_factor=w_cls.sum())
        tgt_boxes = jnp.take_along_axis(
            gt_boxes_n, gidx[..., None].repeat(4, -1), 1)
        n_pos = jnp.maximum(matched_valid.sum(), 1.0)
        wf = matched_valid.astype(jnp.float32)
        loss_bbox = losses.l1_loss(
            boxes, jax.lax.stop_gradient(jnp.stack([
                (tgt_boxes[..., 0] + tgt_boxes[..., 2]) / 2,
                (tgt_boxes[..., 1] + tgt_boxes[..., 3]) / 2,
                tgt_boxes[..., 2] - tgt_boxes[..., 0],
                tgt_boxes[..., 3] - tgt_boxes[..., 1]], -1)),
            weight=wf[..., None], avg_factor=n_pos)
        loss_giou = losses.giou_loss(boxes_xyxy, tgt_boxes, weight=wf,
                                     avg_factor=n_pos)
        return (self.cls_weight * loss_cls,
                self.bbox_weight * loss_bbox,
                self.giou_weight * loss_giou)

    def forward_train(self, images, img_shapes, gt_boxes, gt_labels,
                      gt_valid) -> Dict[str, jnp.ndarray]:
        outs = self._forward_transformer(images, train=True)
        hw = jnp.stack([img_shapes[:, 1], img_shapes[:, 0],
                        img_shapes[:, 1], img_shapes[:, 0]], -1)
        gt_n = gt_boxes / hw[:, None, :]
        result = {}
        layers = outs if self.aux_loss else outs[-1:]
        for li, q in enumerate(layers):
            cls, boxes = self._heads(q)
            lc, lb, lg = self._layer_loss(cls, boxes, gt_n, gt_labels, gt_valid)
            tag = "" if li == len(layers) - 1 else f"d{li}."
            result[f"{tag}loss_cls"] = lc
            result[f"{tag}loss_bbox"] = lb
            result[f"{tag}loss_giou"] = lg
        return result

    def simple_test(self, images, img_shapes, scale_factors=None,
                    max_per_img: int = 100) -> DetResult:
        cls, boxes = self(images, train=False)
        prob = jax.nn.softmax(cls, -1)[..., :self.num_classes]
        B, Q, C = prob.shape
        flat = prob.reshape(B, -1)
        k = min(max_per_img, flat.shape[1])
        top_s, top_i = jax.lax.top_k(flat, k)
        qi = top_i // C
        li = (top_i % C).astype(jnp.int32)
        bx = jnp.take_along_axis(boxes_cxcywh_to_xyxy(boxes),
                                 qi[..., None].repeat(4, -1), 1)
        hw = jnp.stack([img_shapes[:, 1], img_shapes[:, 0],
                        img_shapes[:, 1], img_shapes[:, 0]], -1)
        bx = bx * hw[:, None, :]
        if scale_factors is not None:
            bx = bx / scale_factors[:, None, :]
        mask = top_s > 0.0
        return DetResult(bx, jnp.where(mask, top_s, NEG_INF),
                         jnp.where(mask, li, -1), mask)
