"""PCL (Proposal Cluster Learning) loss with the reference's custom gradient.

Parity target: the wsl pcl_loss kernel (uwsod/projects/WSL/wsl/layers/csrc/
pcl_loss/pcl_loss_cpu.cpp:8-117, CUDA variant identical): per-channel loss

  out[c] = 0                                     if im_labels[c] == 0
  out[0] = -sum_{i: labels_i = 0} w_i * log(max(prob[i, 0], eps))
  out[c] = -sum_{j: pc_labels_j = c} imgw_j * log(max(pc_probs_j, eps))   c > 0

with eps 1e-6 forward. The backward writes (eps 1e-5)

  g[i, 0] = -w_i / max(prob[i, 0], eps)                      labels_i == 0
  g[i, c] = -imgw_{a_i} / max(pc_count_{a_i} * pc_probs_{a_i}, eps)
                                                             labels_i == c > 0

routing the cluster-mean probability gradient back to every member proposal —
reproduced via jax.custom_vjp (the kernel's gradient is NOT the analytic
gradient of the forward; parity requires the custom rule).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS_F = 1e-6
_EPS_B = 1e-5


@jax.custom_vjp
def pcl_loss(
    pcl_probs: jnp.ndarray,          # (R, C) softmax probs, channel 0 = bg
    labels: jnp.ndarray,             # (R,) cluster class per proposal (0 = bg)
    cls_loss_weights: jnp.ndarray,   # (R,)
    gt_assignment: jnp.ndarray,      # (R,) index into the pc_* arrays
    pc_labels: jnp.ndarray,          # (Npos,) cluster class
    pc_probs: jnp.ndarray,           # (Npos,) cluster mean prob
    pc_count: jnp.ndarray,           # (Npos,) cluster size
    img_cls_loss_weights: jnp.ndarray,  # (Npos,)
    im_labels: jnp.ndarray,          # (C,) image-level labels incl. bg slot
) -> jnp.ndarray:
    return _forward(pcl_probs, labels, cls_loss_weights, pc_labels, pc_probs,
                    img_cls_loss_weights, im_labels)


def _forward(pcl_probs, labels, cls_loss_weights, pc_labels, pc_probs,
             img_cls_loss_weights, im_labels):
    r, c = pcl_probs.shape
    # background channel: proposals labeled 0
    bg_terms = jnp.where(
        labels == 0,
        -cls_loss_weights * jnp.log(jnp.maximum(pcl_probs[:, 0], _EPS_F)),
        0.0,
    )
    out0 = jnp.sum(bg_terms)
    # foreground channels: cluster terms grouped by pc_labels
    fg_terms = -img_cls_loss_weights * jnp.log(jnp.maximum(pc_probs, _EPS_F))
    out_fg = jnp.zeros((c,), pcl_probs.dtype).at[pc_labels.astype(jnp.int32)].add(fg_terms)
    out = out_fg.at[0].set(out0)
    return jnp.where(im_labels != 0, out, 0.0)


def _fwd(pcl_probs, labels, cls_loss_weights, gt_assignment, pc_labels, pc_probs,
         pc_count, img_cls_loss_weights, im_labels):
    out = _forward(pcl_probs, labels, cls_loss_weights, pc_labels, pc_probs,
                   img_cls_loss_weights, im_labels)
    res = (pcl_probs, labels, cls_loss_weights, gt_assignment, pc_labels,
           pc_probs, pc_count, img_cls_loss_weights, im_labels)
    return out, res


def _bwd(res, ct):
    (pcl_probs, labels, cls_loss_weights, gt_assignment, pc_labels, pc_probs,
     pc_count, img_cls_loss_weights, im_labels) = res
    r, c = pcl_probs.shape
    labels_i = labels.astype(jnp.int32)
    a = gt_assignment.astype(jnp.int32)
    ch = jnp.arange(c)[None, :]

    g0 = -cls_loss_weights / jnp.maximum(pcl_probs[:, 0], _EPS_B)
    gfg_per_row = -img_cls_loss_weights[a] / jnp.maximum(
        pc_count[a] * pc_probs[a], _EPS_B
    )
    grad = jnp.where(
        (ch == 0) & (labels_i[:, None] == 0),
        g0[:, None],
        jnp.where((ch > 0) & (labels_i[:, None] == ch), gfg_per_row[:, None], 0.0),
    )
    grad = jnp.where(im_labels[None, :] != 0, grad, 0.0)
    # grad[i, c] contributes to out[c] only -> chain with ct[c]. (The reference
    # kernel ignores the incoming gradient entirely; its callers always reduce
    # with sum, i.e. ct = 1, where this is identical.)
    grad = grad * ct[None, :]
    zeros = lambda x: jnp.zeros_like(x)
    return (grad.astype(pcl_probs.dtype), zeros(labels), zeros(cls_loss_weights),
            zeros(gt_assignment), zeros(pc_labels), zeros(pc_probs),
            zeros(pc_count), zeros(img_cls_loss_weights), zeros(im_labels))


pcl_loss.defvjp(_fwd, _bwd)
