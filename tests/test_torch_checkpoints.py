"""Torch-free .pth reader + full-model weight import, round-tripped against
REAL torch-serialized files (torch is available CPU-only in this container).

Parity targets: unbias/ubteacher/checkpoint/detection_checkpoint.py:10-113
(checkpoint loading), tools/convert2detectron2.py:14-24 (teacher/student
extraction). The moment the released SoS-WSOD weights are mountable, AP-parity
eval runs with zero new code (VERDICT r1 item #4 / SURVEY §7 Milestone A)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from sos_wsod_tpu.engine.torch_pickle import state_dict_to_numpy, torch_load
from sos_wsod_tpu.engine.weights import (
    frcnn_param_tree,
    load_frcnn_torch_weights,
    merge_pretrained,
    ubteacher_state_dicts,
    vgg_wsl_param_tree,
)


def test_torch_load_zip_and_legacy_roundtrip(tmp_path):
    sd = {
        "w": torch.randn(3, 4),
        "t": torch.randn(2, 6).t(),  # non-contiguous view
        "half": torch.randn(5).half(),
        "bf16": torch.randn(4).to(torch.bfloat16),
        "i64": torch.arange(7),
        "scalar": torch.tensor(2.5),
        "bool": torch.tensor([True, False, True]),
        "nested": {"x": torch.randn(2, 2)},
    }
    for legacy in (False, True):
        p = str(tmp_path / f"ck_{legacy}.pth")
        torch.save(sd, p, _use_new_zipfile_serialization=not legacy)
        out = torch_load(p)
        for k, v in sd.items():
            if isinstance(v, dict):
                for kk, vv in v.items():
                    np.testing.assert_array_equal(out[k][kk], vv.numpy())
            elif v.dtype == torch.bfloat16:
                np.testing.assert_array_equal(
                    np.asarray(out[k], np.float32), v.float().numpy()
                )
            else:
                np.testing.assert_array_equal(out[k], v.numpy())


def test_torch_load_checkpoint_container(tmp_path):
    p = str(tmp_path / "full.pth")
    torch.save(
        {
            "model": {"m.w": torch.randn(7)},
            "iteration": 42,
            "optimizer": {"state": {0: {"momentum_buffer": torch.randn(7)}}},
        },
        p,
    )
    ck = torch_load(p)
    assert ck["iteration"] == 42
    flat = state_dict_to_numpy(ck)
    assert flat["m.w"].shape == (7,)


def _frcnn_zero_tree():
    """Zero param tree of the production-shaped FRCNN via eval_shape (no compile)."""
    import jax
    import jax.numpy as jnp

    from sos_wsod_tpu.models.meta.rcnn import GeneralizedRCNN

    m = GeneralizedRCNN(
        num_classes=20,
        rpn_kw=dict(pre_nms_topk_train=64, post_nms_topk_train=32,
                    pre_nms_topk_test=64, post_nms_topk_test=32),
        roi_kw=dict(batch_size_per_image=32, detections_per_image=16),
    )
    batch = {
        "image": jnp.zeros((64, 64, 3), jnp.float32),
        "image_hw": jnp.asarray(np.array([64, 64], np.float32)),
        "gt_boxes": jnp.zeros((8, 4)),
        "gt_classes": jnp.zeros((8,), jnp.int32),
        "gt_valid": jnp.zeros((8,), bool),
    }
    shapes = jax.eval_shape(
        lambda: m.init(jax.random.PRNGKey(0), batch, jax.random.PRNGKey(1))
    )["params"]
    return jax.tree_util.tree_map(lambda s: np.zeros(s.shape, s.dtype), shapes)


def _torch_sd_for_frcnn():
    """A d2-named torch state_dict with production R50-FPN shapes."""
    g = torch.Generator().manual_seed(0)

    def r(*shape):
        return torch.randn(*shape, generator=g)

    sd = {
        "pixel_mean": torch.zeros(3, 1, 1),
        "backbone.bottom_up.stem.conv1.weight": r(64, 3, 7, 7),
        "backbone.bottom_up.stem.conv1.norm.weight": r(64),
        "backbone.bottom_up.stem.conv1.norm.bias": r(64),
        "backbone.bottom_up.stem.conv1.norm.running_mean": r(64),
        "backbone.bottom_up.stem.conv1.norm.running_var": r(64).abs(),
        "proposal_generator.rpn_head.conv.weight": r(256, 256, 3, 3),
        "proposal_generator.rpn_head.conv.bias": r(256),
        "proposal_generator.rpn_head.objectness_logits.weight": r(3, 256, 1, 1),
        "proposal_generator.rpn_head.objectness_logits.bias": r(3),
        "proposal_generator.rpn_head.anchor_deltas.weight": r(12, 256, 1, 1),
        "proposal_generator.rpn_head.anchor_deltas.bias": r(12),
        "roi_heads.box_head.fc1.weight": r(1024, 12544),
        "roi_heads.box_head.fc1.bias": r(1024),
        "roi_heads.box_head.fc2.weight": r(1024, 1024),
        "roi_heads.box_head.fc2.bias": r(1024),
        "roi_heads.box_predictor.cls_score.weight": r(21, 1024),
        "roi_heads.box_predictor.cls_score.bias": r(21),
        "roi_heads.box_predictor.bbox_pred.weight": r(80, 1024),
        "roi_heads.box_predictor.bbox_pred.bias": r(80),
    }
    # ResNet blocks (stage sizes 3,4,6,3)
    widths = {"res2": (64, 256, 64), "res3": (128, 512, 256),
              "res4": (256, 1024, 512), "res5": (512, 2048, 1024)}
    depths = {"res2": 3, "res3": 4, "res4": 6, "res5": 3}
    for stage, (w_in, w_out, prev) in widths.items():
        for b in range(depths[stage]):
            pfx = f"backbone.bottom_up.{stage}.{b}"
            c_in = prev if b == 0 else w_out
            for i, (ci, co, k) in enumerate(
                [(c_in, w_in, 1), (w_in, w_in, 3), (w_in, w_out, 1)], start=1
            ):
                sd[f"{pfx}.conv{i}.weight"] = r(co, ci, k, k)
                for leaf in ("weight", "bias", "running_mean"):
                    sd[f"{pfx}.conv{i}.norm.{leaf}"] = r(co)
                sd[f"{pfx}.conv{i}.norm.running_var"] = r(co).abs()
            if b == 0:
                sd[f"{pfx}.shortcut.weight"] = r(w_out, c_in, 1, 1)
                for leaf in ("weight", "bias", "running_mean"):
                    sd[f"{pfx}.shortcut.norm.{leaf}"] = r(w_out)
                sd[f"{pfx}.shortcut.norm.running_var"] = r(w_out).abs()
    for lvl, ci in zip((2, 3, 4, 5), (256, 512, 1024, 2048)):
        sd[f"backbone.fpn_lateral{lvl}.weight"] = r(256, ci, 1, 1)
        sd[f"backbone.fpn_lateral{lvl}.bias"] = r(256)
        sd[f"backbone.fpn_output{lvl}.weight"] = r(256, 256, 3, 3)
        sd[f"backbone.fpn_output{lvl}.bias"] = r(256)
    return sd


def test_frcnn_full_model_import_plain_and_ensemble(tmp_path):
    sd = _torch_sd_for_frcnn()
    params = _frcnn_zero_tree()

    # plain d2 checkpoint {"model": sd}
    p = str(tmp_path / "d2.pth")
    torch.save({"model": sd}, p)
    loaded = load_frcnn_torch_weights(params, p)

    # layout checks against torch ground truth
    np.testing.assert_allclose(
        loaded["backbone"]["bottom_up"]["stem"]["conv1"]["kernel"],
        sd["backbone.bottom_up.stem.conv1.weight"].permute(2, 3, 1, 0).numpy(),
    )
    np.testing.assert_allclose(
        loaded["proposal_generator"]["head"]["conv"]["kernel"],
        sd["proposal_generator.rpn_head.conv.weight"].permute(2, 3, 1, 0).numpy(),
    )
    np.testing.assert_allclose(
        loaded["roi_heads"]["box_predictor"]["cls_score"]["kernel"],
        sd["roi_heads.box_predictor.cls_score.weight"].t().numpy(),
    )
    # fc1 channels-last permutation: functional equivalence — torch fc1 on a
    # (C,H,W)-flattened input == our fc1 on the (H,W,C)-flattened input.
    x = torch.randn(2, 256, 7, 7, generator=torch.Generator().manual_seed(1))
    ref = torch.nn.functional.linear(
        x.flatten(1), sd["roi_heads.box_head.fc1.weight"],
        sd["roi_heads.box_head.fc1.bias"],
    ).numpy()
    x_cl = x.permute(0, 2, 3, 1).numpy().reshape(2, -1)  # channels-last flatten
    got = x_cl @ loaded["roi_heads"]["box_head"]["fc1"]["kernel"] + \
        loaded["roi_heads"]["box_head"]["fc1"]["bias"]
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-4)
    # norm leaves copied verbatim
    np.testing.assert_allclose(
        loaded["backbone"]["bottom_up"]["res4_block2"]["conv2_norm"]["running_var"],
        sd["backbone.bottom_up.res4.2.conv2.norm.running_var"].numpy(),
    )

    # ubteacher ensemble checkpoint: teacher/student roles differ
    ens = {}
    for k, v in sd.items():
        ens[f"modelStudent.{k}"] = v
        ens[f"modelTeacher.{k}"] = v * 2.0 if v.is_floating_point() else v
    pe = str(tmp_path / "ens.pth")
    torch.save({"model": ens}, pe)
    stu = load_frcnn_torch_weights(params, pe, role="student")
    tea = load_frcnn_torch_weights(params, pe, role="teacher")
    np.testing.assert_allclose(
        np.asarray(tea["roi_heads"]["box_head"]["fc2"]["kernel"]),
        2.0 * np.asarray(stu["roi_heads"]["box_head"]["fc2"]["kernel"]),
    )


def test_ubteacher_split_plain_fallback(tmp_path):
    p = str(tmp_path / "plain.pth")
    torch.save({"model": {"roi_heads.box_head.fc2.weight": torch.randn(4, 4)}}, p)
    student, teacher = ubteacher_state_dicts(torch_load(p))
    assert "roi_heads.box_head.fc2.weight" in student
    assert teacher == {}


def test_vgg_wsl_torch_checkpoint_names(tmp_path):
    """Released stage-1 OICR+ keys map into the MultiInputRCNN tree."""
    g = torch.Generator().manual_seed(0)
    sd = {
        "backbone.plain1.conv1.weight": torch.randn(64, 3, 3, 3, generator=g),
        "backbone.plain1.conv1.bias": torch.randn(64, generator=g),
        "roi_heads.box_head.fc1.weight": torch.randn(4096, 512 * 49, generator=g),
        "roi_heads.box_head.fc1.bias": torch.randn(4096, generator=g),
        "roi_heads.box_predictor.cls.weight": torch.randn(20, 4096, generator=g),
        "roi_heads.box_predictor.cls.bias": torch.randn(20, generator=g),
        "roi_heads.box_refinery_0.cls_score.weight": torch.randn(21, 4096, generator=g),
        "roi_heads.box_refinery_0.cls_score.bias": torch.randn(21, generator=g),
    }
    p = str(tmp_path / "oicr.pth")
    torch.save({"model": sd}, p)
    tree = vgg_wsl_param_tree(state_dict_to_numpy(torch_load(p)))
    assert tree["backbone"]["plain1"]["conv1"]["kernel"].shape == (3, 3, 3, 64)
    assert tree["roi_heads"]["dan"]["fc1"]["kernel"].shape == (512 * 49, 4096)
    assert tree["roi_heads"]["wsddn"]["cls"]["kernel"].shape == (4096, 20)
    assert tree["roi_heads"]["box_refinery_0"]["cls_score"]["kernel"].shape == (4096, 21)
    # fc1 channels-last permutation functional check (c=512)
    x = torch.randn(1, 512, 7, 7, generator=g)
    ref = torch.nn.functional.linear(
        x.flatten(1), sd["roi_heads.box_head.fc1.weight"]).numpy()
    got = x.permute(0, 2, 3, 1).numpy().reshape(1, -1) @ np.asarray(
        tree["roi_heads"]["dan"]["fc1"]["kernel"])
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-3)


def test_merge_pretrained_shape_guard():
    params = {"a": np.zeros((2, 2), np.float32)}
    with pytest.raises(AssertionError):
        merge_pretrained(params, {"a": np.zeros((3, 3), np.float32)})
