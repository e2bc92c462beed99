"""Recipe-surface smoke tests: every shipped code-release config must merge
cleanly into the default config (catching key typos/unknown keys at test time,
not launch time) and the flagship recipes must build their models from_cfg.

Reference surface being mirrored:
  uwsod/projects/WSL/configs/Detection/code_release/*.yaml (stage 1),
  unbias/configs/code_release/*.yaml (stages 2-3),
  uwsod/run/code_release/*.sh + unbias/run/code_release/*.sh.
"""
import pathlib

import jax.numpy as jnp
import pytest

from sos_wsod_tpu.config import get_default_cfg

REPO = pathlib.Path(__file__).resolve().parents[1]
ALL_CONFIGS = sorted(
    p for p in (REPO / "configs").rglob("*.yaml") if "Base" not in p.name
)

# reference code-release recipes that must have a same-named counterpart
REFERENCE_RECIPES = [
    # uwsod/projects/WSL/configs/Detection/code_release/
    "voc07_oicr_plus.yaml", "coco_oicr_plus.yaml",
    "detection_result_test.yaml", "detection_result_test_coco.yaml",
    # unbias/configs/code_release/
    "voc_baseline.yaml", "voc_split.yaml", "voc_ssod.yaml",
    "coco_baseline.yaml", "coco_split.yaml", "coco_ssod.yaml",
    "voc07_tta_test.yaml", "coco_tta_test.yaml",
    "sos_plus_test.yaml", "sos_plus_wo_imagenet_test.yaml",
]

# reference run scripts that must have a same-named counterpart
REFERENCE_SCRIPTS = [
    "oicr_plus_voc07.sh", "oicr_plus_voc07_detection_result.sh",
    "oicr_plus_coco.sh", "oicr_plus_coco_detection_result.sh",
    "voc_baseline.sh", "voc_ssod.sh",
    "coco_baseline.sh", "coco_ssod.sh", "tta_test.sh",
]


def test_reference_recipe_files_present():
    names = {p.name for p in ALL_CONFIGS}
    missing = [r for r in REFERENCE_RECIPES if r not in names]
    assert not missing, f"missing code-release configs: {missing}"


def test_reference_run_scripts_present():
    names = {p.name for p in (REPO / "run" / "code_release").glob("*.sh")}
    missing = [s for s in REFERENCE_SCRIPTS if s not in names]
    assert not missing, f"missing run scripts: {missing}"


@pytest.mark.parametrize("path", ALL_CONFIGS, ids=lambda p: p.name)
def test_config_merges_into_defaults(path):
    cfg = get_default_cfg()
    cfg.merge_from_file(str(path))  # raises on unknown/mistyped keys
    cfg.freeze()


def test_coco_oicr_plus_builds_model():
    from sos_wsod_tpu.models.meta.rcnn_wsl import MultiInputRCNN

    cfg = get_default_cfg()
    cfg.merge_from_file(str(REPO / "configs/stage1/coco_oicr_plus.yaml"))
    m = MultiInputRCNN.from_cfg(cfg)
    assert m.num_classes == 80
    assert m.freeze_at == 3
    assert cfg.DATASETS.PRECOMPUTED_PROPOSAL_TOPK_TRAIN == 10000


@pytest.mark.parametrize("name,loss,pos_frac,reg_type", [
    ("coco_baseline.yaml", "CrossEntropy", 0.25, "smooth_l1"),
    ("coco_ssod.yaml", "FocalLoss", 0.25, "smooth_l1"),
    ("voc_split.yaml", "CrossEntropy", 1.0, "smooth_l1_mean"),
    ("coco_split.yaml", "CrossEntropy", 1.0, "smooth_l1_mean"),
])
def test_stage23_recipes_build_model(name, loss, pos_frac, reg_type):
    from sos_wsod_tpu.models.meta.rcnn import GeneralizedRCNN

    cfg = get_default_cfg()
    cfg.merge_from_file(str(REPO / f"configs/stage23/{name}"))
    assert cfg.MODEL.ROI_HEADS.LOSS == loss
    assert cfg.MODEL.ROI_HEADS.POSITIVE_FRACTION == pos_frac
    assert cfg.MODEL.ROI_BOX_HEAD.BBOX_REG_LOSS_TYPE == reg_type
    m = GeneralizedRCNN.from_cfg(cfg)
    expected_classes = 20 if name.startswith("voc") else 80
    assert m.num_classes == expected_classes


def test_tta_configs_enable_aug_surface():
    cfg = get_default_cfg()
    cfg.merge_from_file(str(REPO / "configs/stage23/voc07_tta_test.yaml"))
    assert cfg.TEST.AUG.ENABLED is True
    assert tuple(cfg.TEST.AUG.MIN_SIZES) == (480, 576, 672, 768, 864, 960,
                                             1056, 1152)
    assert cfg.TEST.AUG.FLIP is True
    cfg2 = get_default_cfg()
    cfg2.merge_from_file(str(REPO / "configs/stage23/sos_plus_test.yaml"))
    assert cfg2.INPUT.FORMAT == "RGB"
    assert cfg2.MODEL.ROI_BOX_HEAD.NUM_CONV == 4
