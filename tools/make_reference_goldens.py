"""Generate golden kernel fixtures by compiling the REFERENCE's own CPU
kernels (SoS-WSOD, /root/reference) against the installed torch, and
recording their outputs on fixed-seed inputs.

Why: torchvision is not installed in this container, so our kernel parity
tests otherwise rely on spec-derived numpy oracles (tests/oracles.py).
VERDICT.md (round 1, Weak #4) asked for reference-recorded tensors as the
source of truth for rounding / tie-break behavior. The reference ships CPU
implementations of every WSOD op (e.g.
uwsod/projects/WSL/wsl/layers/csrc/ROILoopPool/ROILoopPool_cpu.cpp — whose
"box" region IS torchvision RoIPool semantics), which torch 2.x can compile.

This script only runs where /root/reference and torch exist; its output
(.npz files under tests/goldens/) is committed so the parity tests in
tests/test_reference_goldens.py always run. No reference code enters the
repo — the extension is built in a temp dir and only tensors are saved.

Usage: python tools/make_reference_goldens.py [--out tests/goldens]
"""
from __future__ import annotations

import argparse
import os
import pathlib
import shutil
import sys

import numpy as np

REF = pathlib.Path("/root/reference")
WSL_CSRC = REF / "uwsod/projects/WSL/wsl/layers/csrc"
D2_CSRC = REF / "uwsod/detectron2/layers/csrc"

BINDINGS = r"""
#include <torch/extension.h>
#include <tuple>

namespace wsl {
std::tuple<at::Tensor, at::Tensor> ROILoopPool_forward_cpu(
    const at::Tensor& input, const at::Tensor& rois,
    const float spatial_scale, const int pooled_height,
    const int pooled_width);
at::Tensor ROILoopPool_backward_cpu(
    const at::Tensor& grad, const at::Tensor& rois, const at::Tensor& argmax,
    const float spatial_scale, const int pooled_height, const int pooled_width,
    const int batch_size, const int channels, const int height,
    const int width);
int pcl_loss_forward_cpu(
    at::Tensor& pcl_probs, at::Tensor& labels, at::Tensor& cls_loss_weights,
    at::Tensor& pc_labels, at::Tensor& pc_probs,
    at::Tensor& img_cls_loss_weights, at::Tensor& im_labels,
    at::Tensor& output);
int pcl_loss_backward_cpu(
    at::Tensor& pcl_probs, at::Tensor& labels, at::Tensor& cls_loss_weights,
    at::Tensor& gt_assignment, at::Tensor& pc_labels, at::Tensor& pc_probs,
    at::Tensor& pc_count, at::Tensor& img_cls_loss_weights,
    at::Tensor& im_labels, at::Tensor& top_grad, at::Tensor& bottom_grad);
std::tuple<at::Tensor, at::Tensor, at::Tensor, at::Tensor, at::Tensor>
ROIMerge_forward_cpu(
    const at::Tensor& S, const at::Tensor& J, const at::Tensor& C,
    const at::Tensor& D, const at::Tensor& P);
std::tuple<at::Tensor, at::Tensor, at::Tensor> ROILabel_forward_cpu(
    const at::Tensor& S, const at::Tensor& U, const at::Tensor& L,
    const at::Tensor& CW, const at::Tensor& P);
}
namespace detectron2 {
at::Tensor ROIAlign_forward_cpu(
    const at::Tensor& input, const at::Tensor& rois,
    const float spatial_scale, const int pooled_height,
    const int pooled_width, const int sampling_ratio, bool aligned);
}

PYBIND11_MODULE(TORCH_EXTENSION_NAME, m) {
  m.def("roi_loop_pool_forward", &wsl::ROILoopPool_forward_cpu);
  m.def("roi_loop_pool_backward", &wsl::ROILoopPool_backward_cpu);
  m.def("roi_align_forward", &detectron2::ROIAlign_forward_cpu);
  m.def("pcl_loss_forward", &wsl::pcl_loss_forward_cpu);
  m.def("pcl_loss_backward", &wsl::pcl_loss_backward_cpu);
  m.def("roi_merge_forward", &wsl::ROIMerge_forward_cpu);
  m.def("roi_label_forward", &wsl::ROILabel_forward_cpu);
}
"""


def build_extension(tmp: pathlib.Path):
    """Copy reference CPU sources (patching the removed TH/TH.h include for
    torch 2.x), add bindings, and build with torch.utils.cpp_extension."""
    from torch.utils import cpp_extension

    src = tmp / "src"
    src.mkdir(parents=True, exist_ok=True)
    wanted = [
        WSL_CSRC / "ROILoopPool/ROILoopPool_cpu.cpp",
        WSL_CSRC / "ROILoopPool/ROILoopPool.h",
        WSL_CSRC / "pcl_loss/pcl_loss_cpu.cpp",
        WSL_CSRC / "pcl_loss/pcl_loss.h",
        WSL_CSRC / "ROIMerge/ROIMerge_cpu.cpp",
        WSL_CSRC / "ROIMerge/ROIMerge.h",
        WSL_CSRC / "ROILabel/ROILabel_cpu.cpp",
        WSL_CSRC / "ROILabel/ROILabel.h",
        D2_CSRC / "ROIAlign/ROIAlign_cpu.cpp",
        D2_CSRC / "ROIAlign/ROIAlign.h",
    ]
    cpps = []
    for f in wanted:
        text = f.read_text()
        # TH/TH.h was removed in torch 2.x; it used to pull in the C float /
        # stdlib headers these kernels rely on
        text = text.replace(
            "#include <TH/TH.h>",
            "#include <cfloat>\n#include <cmath>\n#include <cstdio>\n"
            "#include <cstdlib>\n#include <ctime>\n#include <vector>\n"
            "#include <algorithm>")
        # headers are included as "ROILoopPool.h" etc. from the same dir
        out = src / f.name
        out.write_text(text)
        if f.suffix == ".cpp":
            cpps.append(str(out))
    (src / "bindings.cpp").write_text(BINDINGS)
    cpps.append(str(src / "bindings.cpp"))
    return cpp_extension.load(
        name="sos_ref_kernels",
        sources=cpps,
        extra_cflags=["-O2"],
        build_directory=str(tmp / "build"),
        verbose=False,
    )


def mixed_rois(rng, n, img_h, img_w, batch_ind=0.0):
    """XYXY rois in image coords with edge / tiny / full-image cases, in the
    reference's (batch_ind, x1, y1, x2, y2) layout."""
    x1 = rng.uniform(0, img_w - 10, n)
    y1 = rng.uniform(0, img_h - 10, n)
    x2 = np.minimum(x1 + rng.uniform(2, img_w / 2, n), img_w)
    y2 = np.minimum(y1 + rng.uniform(2, img_h / 2, n), img_h)
    rois = np.stack([np.full(n, batch_ind), x1, y1, x2, y2], 1)
    rois[0] = [batch_ind, 0, 0, img_w, img_h]
    rois[1] = [batch_ind, 5, 5, 6, 6]
    rois[2] = [batch_ind, img_w - 4, img_h - 4, img_w, img_w]
    rois[3] = [batch_ind, 11.5, 3.5, 200.49, 100.51]  # .5 rounding edges
    return np.ascontiguousarray(rois, np.float32)


def gen_roi_pool(ext, out_dir):
    import torch

    rng = np.random.RandomState(7)
    h, w, c, n = 40, 64, 32, 24
    feat = rng.randn(1, c, h, w).astype(np.float32)
    rois = mixed_rois(rng, n, h * 8, w * 8)
    out, argmax = ext.roi_loop_pool_forward(
        torch.from_numpy(feat), torch.from_numpy(rois), 0.125, 7, 7)
    grad = rng.randn(*out.shape).astype(np.float32)
    gin = ext.roi_loop_pool_backward(
        torch.from_numpy(grad), torch.from_numpy(rois), argmax,
        0.125, 7, 7, 1, c, h, w)
    np.savez_compressed(
        out_dir / "roi_loop_pool.npz", feat=feat, rois=rois,
        spatial_scale=0.125, out=out.numpy(), argmax=argmax.numpy(),
        grad_out=grad, grad_in=gin.numpy())
    print("roi_loop_pool:", out.shape, "argmax dtype", argmax.dtype)

    # bf16-quantized variant: values are exactly representable in bf16, so
    # the reference's f32 argmax (incl. tie-breaks) must equal our bf16
    # key-table / Pallas argmax bit-for-bit
    feat16 = (torch.from_numpy(feat).to(torch.bfloat16)
              .to(torch.float32).numpy())
    out16, argmax16 = ext.roi_loop_pool_forward(
        torch.from_numpy(feat16), torch.from_numpy(rois), 0.125, 7, 7)
    np.savez_compressed(
        out_dir / "roi_pool_bf16.npz", feat=feat16, rois=rois,
        spatial_scale=0.125, out=out16.numpy()[:n],
        argmax=argmax16.numpy()[:n])
    print("roi_pool_bf16:", out16.shape)


def gen_roi_align(ext, out_dir):
    import torch

    rng = np.random.RandomState(8)
    h, w, c, n = 40, 64, 32, 24
    feat = rng.randn(1, c, h, w).astype(np.float32)
    rois = mixed_rois(rng, n, h * 8, w * 8)
    for aligned in (False, True):
        for sampling in (0, 2):
            out = ext.roi_align_forward(
                torch.from_numpy(feat), torch.from_numpy(rois),
                0.125, 7, 7, sampling, aligned)
            tag = f"roi_align_s{sampling}_{'v2' if aligned else 'v1'}"
            np.savez_compressed(
                out_dir / f"{tag}.npz", feat=feat, rois=rois,
                spatial_scale=0.125, sampling_ratio=sampling,
                aligned=aligned, out=out.numpy())
            print(tag, out.shape)


def gen_pcl_loss(ext, out_dir):
    import torch

    rng = np.random.RandomState(9)
    r, c, npos = 64, 21, 6
    probs = rng.dirichlet(np.ones(c), size=r).astype(np.float32)
    pc_labels = rng.randint(1, c, npos).astype(np.float32)
    pc_probs = rng.uniform(0.2, 0.9, npos).astype(np.float32)
    iclw = rng.uniform(0.1, 1.0, npos).astype(np.float32)
    # labels must be cluster-consistent (pcl_loss_cpu.cpp backward asserts
    # labels[i] == pc_labels[gt_assignment[i]] for foreground rois)
    gt_assign = rng.randint(0, npos, r).astype(np.float32)
    labels = pc_labels[gt_assign.astype(int)].copy()
    labels[:16] = 0
    clw = rng.uniform(0.1, 1.0, r).astype(np.float32)
    pc_count = np.maximum(np.bincount(
        gt_assign[16:].astype(int), minlength=npos), 1).astype(np.float32)
    im_labels = np.zeros(c, np.float32)
    im_labels[np.unique(pc_labels.astype(int))] = 1.0
    im_labels[0] = 1.0

    t = {k: torch.from_numpy(v.copy()) for k, v in dict(
        probs=probs, labels=labels, clw=clw, gt=gt_assign,
        pcl=pc_labels, pcp=pc_probs, pcc=pc_count, iclw=iclw,
        iml=im_labels).items()}
    # reference layouts (wsl/layers/pcl_loss.py): output is (1, channels)
    out = torch.zeros(1, c)
    ext.pcl_loss_forward(t["probs"], t["labels"].view(1, r),
                         t["clw"].view(1, r), t["pcl"].view(1, npos),
                         t["pcp"].view(1, npos), t["iclw"].view(1, npos),
                         t["iml"].view(1, c), out)
    top_grad = torch.ones(())
    bottom = torch.zeros(r, c)
    ext.pcl_loss_backward(t["probs"], t["labels"].view(1, r),
                          t["clw"].view(1, r), t["gt"].view(1, r),
                          t["pcl"].view(1, npos), t["pcp"].view(1, npos),
                          t["pcc"].view(1, npos), t["iclw"].view(1, npos),
                          t["iml"].view(1, c), top_grad, bottom)
    np.savez_compressed(
        out_dir / "pcl_loss.npz", probs=probs, labels=labels,
        cls_loss_weights=clw, gt_assignment=gt_assign, pc_labels=pc_labels,
        pc_probs=pc_probs, pc_count=pc_count, img_cls_loss_weights=iclw,
        im_labels=im_labels, out=out.numpy(), grad_in=bottom.numpy())
    print("pcl_loss:", float(out.sum()))


def gen_roi_merge(ext, out_dir):
    import torch

    rng = np.random.RandomState(10)
    r, k = 48, 20
    s = rng.uniform(0, 1, (r, 1)).astype(np.float32)
    boxes = mixed_rois(rng, r, 320, 512)[:, 1:]
    x1, y1, x2, y2 = boxes.T
    area = np.maximum(x2 - x1, 0) * np.maximum(y2 - y1, 0)
    ix1 = np.maximum(x1[:, None], x1[None, :])
    iy1 = np.maximum(y1[:, None], y1[None, :])
    ix2 = np.minimum(x2[:, None], x2[None, :])
    iy2 = np.minimum(y2[:, None], y2[None, :])
    inter = np.maximum(ix2 - ix1, 0) * np.maximum(iy2 - iy1, 0)
    iou = (inter / np.maximum(area[:, None] + area[None, :] - inter, 1e-9)
           ).astype(np.float32)
    c = rng.uniform(0, 1, (r, k)).astype(np.float32)
    d = rng.uniform(0, 1, (r, k)).astype(np.float32)
    for cur_iter, max_epoch, size_epoch in [(0, 20, 100), (950, 20, 100),
                                            (1999, 20, 100)]:
        # P layout (wsl/layers/roi_merge.py:35-45): int32 [debug_info,
        # display, cur_iter, max_epoch, size_epoch, acc...x3]; display large
        # so the kernel's `cur_iter % display` logging branch never fires
        p = np.array([0, 1 << 30, cur_iter, max_epoch, size_epoch, 0, 0, 0],
                     np.int32)
        mc, md, ij, iu, inn = ext.roi_merge_forward(
            torch.from_numpy(s), torch.from_numpy(iou), torch.from_numpy(c),
            torch.from_numpy(d), torch.from_numpy(p.copy()))
        np.savez_compressed(
            out_dir / f"roi_merge_i{cur_iter}.npz", S=s, J=iou, C=c, D=d,
            P=p, MC=mc.numpy(), MD=md.numpy(), IJ=ij.numpy(), IU=iu.numpy(),
            IN=inn.numpy())
        print(f"roi_merge iter={cur_iter}:", mc.shape, ij.shape)


def gen_roi_label(ext, out_dir):
    import torch

    rng = np.random.RandomState(11)
    r, c = 48, 20
    s = rng.uniform(0, 1, (r, c)).astype(np.float32)
    boxes = mixed_rois(rng, r, 320, 512)[:, 1:]
    x1, y1, x2, y2 = boxes.T
    area = np.maximum(x2 - x1, 0) * np.maximum(y2 - y1, 0)
    ix1 = np.maximum(x1[:, None], x1[None, :])
    iy1 = np.maximum(y1[:, None], y1[None, :])
    ix2 = np.minimum(x2[:, None], x2[None, :])
    iy2 = np.minimum(y2[:, None], y2[None, :])
    inter = np.maximum(ix2 - ix1, 0) * np.maximum(iy2 - iy1, 0)
    u = (inter / np.maximum(area[:, None] + area[None, :] - inter, 1e-9)
         ).astype(np.float32)
    lab = np.zeros((1, c), np.float32)
    lab[0, rng.choice(c, 3, replace=False)] = 1.0
    cw = rng.uniform(0.2, 1.0, (1, c)).astype(np.float32)
    # P layout (wsl/layers/roi_label.py:35-55): float [fg, bg_hi, bg_lo,
    # num_pos, num_neg, top_k, debug_info, uuid, display, cur_iter, acc x4].
    # num_pos/num_neg >= R makes the output independent of the kernel's
    # srand(time) shuffle (the shuffle only decides who hits the caps), so
    # the fixture is deterministic; display large avoids the logging branch.
    p = np.array([0.5, 0.5, 0.1, 10000, 10000, 1, 0, 1234, 1 << 30,
                  0, 0, 0, 0, 0], np.float32)
    gl, gw, gp = ext.roi_label_forward(
        torch.from_numpy(s), torch.from_numpy(u), torch.from_numpy(lab),
        torch.from_numpy(cw), torch.from_numpy(p.copy()))
    np.savez_compressed(
        out_dir / "roi_label.npz", S=s, U=u, L=lab, CW=cw, P=p,
        RL=gl.numpy(), RW=gw.numpy())
    print("roi_label:", gl.shape, gw.shape)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="tests/goldens")
    ap.add_argument("--tmp", default="/tmp/sos_ref_goldens")
    args = ap.parse_args(argv)
    if not REF.exists():
        sys.exit("reference checkout not found; goldens can only be "
                 "regenerated where /root/reference is mounted")
    out_dir = pathlib.Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    tmp = pathlib.Path(args.tmp)
    if tmp.exists():
        shutil.rmtree(tmp)
    tmp.mkdir(parents=True)
    (tmp / "build").mkdir()
    ext = build_extension(tmp)
    gen_roi_pool(ext, out_dir)
    gen_roi_align(ext, out_dir)
    gen_pcl_loss(ext, out_dir)
    gen_roi_merge(ext, out_dir)
    gen_roi_label(ext, out_dir)
    print("goldens written to", out_dir)


if __name__ == "__main__":
    main()
