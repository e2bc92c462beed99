"""Full 3-stage pipeline integration test on a synthetic VOC-format dataset.

Drives the exact inter-stage FILE CONTRACTS of the reference pipeline
(reference: README.md:175-240, tools/pgf.py:295-315, unbias/split_single.py):

  stage-1 train (CLI) -> eval-only w/ WSODEVAL.SAVE_DETECTION_RESULT
  -> detection_results/oicr_plus_voc_2007_{train,val}.json
  -> tools/pgf -> pseudo_labels JSONs -> tools/add_multi_label
  -> stage-2 burn-in train over voc_2007_{train,val}_wsl (CLI)
  -> tools/splits (per-image loss scoring -> dataseed JSON)
  -> stage-3 semisup train past burn-in (CLI) -> VOC evaluator.

Everything runs through the real CLIs on the 8-device virtual CPU mesh, with
tiny images/model dims so the whole chain stays fast.
"""
from __future__ import annotations

import argparse
import json
import os
import pickle

import numpy as np
import pytest

from sos_wsod_tpu.data.datasets.voc import CLASS_NAMES
from sos_wsod_tpu.tools.splits import generate_base_split

N_TRAIN, N_VAL, N_TEST = 8, 4, 4
H, W = 96, 128
N_PROPS = 40


def _write_jpeg(path, rng):
    from PIL import Image

    arr = rng.randint(0, 255, (H, W, 3), np.uint8)
    # paint a bright box so features aren't pure noise
    x1, y1 = rng.randint(8, W // 2), rng.randint(8, H // 2)
    arr[y1:y1 + 32, x1:x1 + 40] = [250, 60, 60]
    Image.fromarray(arr).save(path, quality=92)
    return [float(x1), float(y1), float(x1 + 40), float(y1 + 32)]


def _write_xml(path, fileid, box, cls_name):
    x1, y1, x2, y2 = [int(v) for v in box]
    xml = f"""<annotation>
  <filename>{fileid}.jpg</filename>
  <size><width>{W}</width><height>{H}</height><depth>3</depth></size>
  <object>
    <name>{cls_name}</name><difficult>0</difficult>
    <bndbox><xmin>{x1 + 1}</xmin><ymin>{y1 + 1}</ymin><xmax>{x2}</xmax><ymax>{y2}</ymax></bndbox>
  </object>
</annotation>
"""
    with open(path, "w") as f:
        f.write(xml)


def _rand_proposals(rng, gt_box):
    boxes = np.zeros((N_PROPS, 4), np.float32)
    x1 = rng.uniform(0, W - 16, N_PROPS)
    y1 = rng.uniform(0, H - 16, N_PROPS)
    boxes[:, 0], boxes[:, 1] = x1, y1
    boxes[:, 2] = np.minimum(x1 + rng.uniform(8, W / 2, N_PROPS), W - 1)
    boxes[:, 3] = np.minimum(y1 + rng.uniform(8, H / 2, N_PROPS), H - 1)
    boxes[0] = gt_box  # ensure one good proposal
    return boxes


@pytest.fixture(scope="module", autouse=True)
def _no_compilation_cache():
    """XLA segfaults while SERIALIZING this module's stage-2/3 ubteacher
    executable for the persistent-cache write (reproduced twice, r5:
    `Fatal Python error: Segmentation fault` in
    compilation_cache.put_executable_and_time — size-dependent: the small
    multihost semisup program serializes fine). Disable the cache for this
    module only; these tests are slow-marked and pay their compiles anyway."""
    import jax

    jax.config.update("jax_enable_compilation_cache", False)
    yield
    jax.config.update("jax_enable_compilation_cache", True)


@pytest.fixture(scope="module")
def voc_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("pipeline")
    d = root / "datasets" / "VOC2007"
    for sub in ("JPEGImages", "Annotations", "ImageSets/Main"):
        (d / sub).mkdir(parents=True)
    (root / "datasets" / "proposals").mkdir()
    rng = np.random.RandomState(7)
    splits = {"train": [], "val": [], "test": []}
    all_ids, all_boxes, all_logits = {}, {}, {}
    idx = 0
    for split, n in (("train", N_TRAIN), ("val", N_VAL), ("test", N_TEST)):
        ids, pboxes, plogits = [], [], []
        for _ in range(n):
            idx += 1
            fileid = f"{idx:06d}"
            gt = _write_jpeg(str(d / "JPEGImages" / f"{fileid}.jpg"), rng)
            cls = CLASS_NAMES[rng.randint(0, 20)]
            _write_xml(str(d / "Annotations" / f"{fileid}.xml"), fileid, gt, cls)
            splits[split].append(fileid)
            ids.append(fileid)
            pboxes.append(_rand_proposals(rng, gt))
            plogits.append(rng.uniform(0.1, 1.0, N_PROPS).astype(np.float32))
        all_ids[split], all_boxes[split], all_logits[split] = ids, pboxes, plogits
        with open(d / "ImageSets" / "Main" / f"{split}.txt", "w") as f:
            f.write("\n".join(splits[split]) + "\n")
        with open(root / "datasets" / "proposals" / f"mcg_voc_2007_{split}_d2.pkl", "wb") as f:
            pickle.dump({"ids": ids, "boxes": pboxes,
                         "objectness_logits": plogits, "bbox_mode": 0}, f)
    return root


def _args(config_file, opts, eval_only=False):
    return argparse.Namespace(
        config_file=config_file, opts=opts, eval_only=eval_only, resume=False,
        num_gpus=1, num_machines=1, machine_rank=0, dist_url="auto",
    )


STAGE1_YAML = """
MODEL:
  META_ARCHITECTURE: "MultiInputRCNN"
  WEIGHTS: ""
  LOAD_PROPOSALS: True
  PIXEL_MEAN: [103.939, 116.779, 123.68]
  BACKBONE: {NAME: "build_vgg_backbone", FREEZE_AT: 2}
  VGG: {DEPTH: 16, CONV5_DILATION: 2}
  ROI_HEADS:
    NAME: "OICRPlusHeads"
    NUM_CLASSES: 20
    SCORE_THRESH_TEST: 0.000001
    NMS_THRESH_TEST: 0.3
  ROI_BOX_HEAD: {POOLER_TYPE: "ROIPool", DAN_DIM: [48, 48]}
DATASETS:
  TRAIN: ["voc_2007_train"]
  TEST: []
  PROPOSAL_FILES_TRAIN: ["datasets/proposals/mcg_voc_2007_train_d2.pkl"]
  PROPOSAL_FILES_TEST: ["datasets/proposals/mcg_voc_2007_train_d2.pkl", "datasets/proposals/mcg_voc_2007_val_d2.pkl", "datasets/proposals/mcg_voc_2007_test_d2.pkl"]
  PRECOMPUTED_PROPOSAL_TOPK_TRAIN: 64
  PRECOMPUTED_PROPOSAL_TOPK_TEST: 64
INPUT:
  MIN_SIZE_TRAIN: [64, 96]
  MAX_SIZE_TRAIN: 160
  MIN_SIZE_TEST: 96
  MAX_SIZE_TEST: 160
  CROP: {ENABLED: False}
SOLVER:
  MAX_ITER: 2
  IMS_PER_BATCH: 8
  BASE_LR: 0.0001
  WARMUP_ITERS: 0
  CHECKPOINT_PERIOD: 100
TEST: {EVAL_PERIOD: 0}
WSL: {REFINE_NUM: 2, REFINE_REG: [False, False], ITER_SIZE: 1}
TPU:
  PROPOSAL_CAPACITY: 64
  PGT_SEED_CAPACITY: 16
  IMAGE_SIZE_DIVISIBILITY: 32
  MESH_DEVICES: 1
DATALOADER: {NUM_WORKERS: 0, FILTER_EMPTY_ANNOTATIONS: False}
WSODEVAL: {SAVE_DETECTION_RESULT: False}
OUTPUT_DIR: "output/stage1"
SEED: 1234
"""

STAGE23_YAML = """
MODEL:
  META_ARCHITECTURE: "TwoStagePseudoLabGeneralizedRCNN"
  WEIGHTS: ""
  PIXEL_MEAN: [103.530, 116.280, 123.675]
  RESNETS: {DEPTH: 14}
  FPN: {OUT_CHANNELS: 32, IN_FEATURES: ["res2", "res3", "res4", "res5"]}
  PROPOSAL_GENERATOR: {NAME: "PseudoLabRPN"}
  RPN: {IN_FEATURES: ["p2", "p3", "p4", "p5", "p6"], POSITIVE_FRACTION: 0.25, POST_NMS_TOPK_TRAIN: 64, POST_NMS_TOPK_TEST: 64, PRE_NMS_TOPK_TRAIN: 128, PRE_NMS_TOPK_TEST: 128}
  ROI_HEADS:
    NAME: "StandardROIHeadsPseudoLab"
    IN_FEATURES: ["p2", "p3", "p4", "p5"]
    LOSS: "CrossEntropy"
    NUM_CLASSES: 20
    BATCH_SIZE_PER_IMAGE: 32
  ROI_BOX_HEAD: {FC_DIM: 64}
DATASETS:
  TRAIN: ["voc_2007_train_wsl", "voc_2007_val_wsl"]
  TEST: ["voc_2007_test"]
INPUT:
  MIN_SIZE_TRAIN: [96]
  MAX_SIZE_TRAIN: 160
  MIN_SIZE_TEST: 96
  MAX_SIZE_TEST: 160
SOLVER:
  MAX_ITER: 2
  IMG_PER_BATCH_LABEL: 8
  IMG_PER_BATCH_UNLABEL: 8
  BASE_LR: 0.0001
  WARMUP_ITERS: 0
  CHECKPOINT_PERIOD: 100
TEST: {EVAL_PERIOD: 0, EVALUATOR: "VOCeval"}
SEMISUPNET:
  Trainer: "ubteacher"
  BURN_UP_STEP: 100
  EVAL_TEACHER: False
DATALOADER:
  NUM_WORKERS: 0
  FILTER_EMPTY_ANNOTATIONS: False
  SUP_PERCENT: __SUP_PERCENT__
  RANDOM_DATA_SEED: 1
  RANDOM_DATA_SEED_PATH: "__DATASEED__"
TPU:
  PGT_CAPACITY: 16
  IMAGE_SIZE_DIVISIBILITY: 32
  MESH_DEVICES: 1
OUTPUT_DIR: "__OUT_DIR__"
SEED: 1234
"""

SPLIT_YAML = """
MODEL:
  META_ARCHITECTURE: "TwoStagePseudoLabGeneralizedRCNN"
  RESNETS: {DEPTH: 14}
  FPN: {OUT_CHANNELS: 32, IN_FEATURES: ["res2", "res3", "res4", "res5"]}
  RPN: {IN_FEATURES: ["p2", "p3", "p4", "p5", "p6"], POST_NMS_TOPK_TRAIN: 64, POST_NMS_TOPK_TEST: 64, PRE_NMS_TOPK_TRAIN: 128, PRE_NMS_TOPK_TEST: 128}
  ROI_HEADS: {IN_FEATURES: ["p2", "p3", "p4", "p5"], NUM_CLASSES: 20, BATCH_SIZE_PER_IMAGE: 32}
  ROI_BOX_HEAD: {FC_DIM: 64}
DATASETS:
  TRAIN: ["voc_2007_train_wsl", "voc_2007_val_wsl"]
INPUT: {MIN_SIZE_TEST: 96, MAX_SIZE_TEST: 160}
TPU: {PGT_CAPACITY: 16, IMAGE_SIZE_DIVISIBILITY: 32, MESH_DEVICES: 1}
"""


@pytest.fixture(scope="module")
def pipeline_run(voc_root):
    """Run the full 3-stage chain once per module. A fixture (not a test) so
    the dependent TTA CLI test can be selected alone (`pytest -k tta`) and
    still find the stage-1/3 checkpoints it exercises."""
    cwd = os.getcwd()
    os.chdir(voc_root)
    try:
        yield _run_three_stage_pipeline(voc_root)
    finally:
        os.chdir(cwd)


def _run_three_stage_pipeline(voc_root):
    from tools import train_net_stage1, train_net_unbias
    from sos_wsod_tpu.tools import add_multi_label, pgf, splits

    cfg1 = voc_root / "stage1.yaml"
    cfg1.write_text(STAGE1_YAML)

    # ---- stage 1: train 2 iters
    train_net_stage1.main(_args(str(cfg1), []))
    assert (voc_root / "output/stage1/model_final").exists()

    # ---- stage 1: eval-only w/ detection-result dump over train+val
    train_net_stage1.main(_args(str(cfg1), [
        "DATASETS.TEST", "('voc_2007_train','voc_2007_val')",
        "WSODEVAL.SAVE_DETECTION_RESULT", "True",
        "WSODEVAL.SAVE_PATH", "datasets/VOC2007/detection_results/oicr_plus_{}.json",
    ], eval_only=True))
    det_dir = voc_root / "datasets/VOC2007/detection_results"
    for split in ("train", "val"):
        path = det_dir / f"oicr_plus_voc_2007_{split}.json"
        assert path.exists(), f"missing detection dump {path}"
        dump = json.loads(path.read_text())
        assert isinstance(dump, list) and dump, "empty detection dump"
        for rec in dump[:5]:
            assert set(rec) >= {"image_id", "category_id", "bbox", "score"}
            assert 1 <= rec["category_id"] <= 20, "category_id must be 1-based"
            assert len(rec["bbox"]) == 4

    # ---- glue: pgf + add_multi_label
    pgf.main(["--det-path", "datasets/VOC2007/detection_results/",
              "--save-path", "datasets/VOC2007/pseudo_labels/"])
    pl_dir = voc_root / "datasets/VOC2007/pseudo_labels"
    for split in ("train", "val"):
        pgt = json.loads((pl_dir / f"oicr_plus_voc_2007_{split}.json").read_text())
        assert pgt, "pgf produced empty pseudo labels"
        for img_id, anns in list(pgt.items())[:3]:
            int(img_id)
            for a in anns:
                assert 0 <= a["category_id"] <= 19, "pseudo labels are 0-based"

    add_multi_label.main(["--pgt-temp",
                          "datasets/VOC2007/pseudo_labels/oicr_plus_voc_2007_{}.json"])
    pgt = json.loads((pl_dir / "oicr_plus_voc_2007_train.json").read_text())
    assert "multi_label" in pgt
    assert all(isinstance(v, list) for v in pgt["multi_label"].values())

    # ---- stage 2: burn-in (supervised) training on the pseudo labels
    n_imgs = N_TRAIN + N_VAL
    base_seed = generate_base_split(n_imgs)
    dataseed2 = voc_root / "dataseed_base.txt"
    dataseed2.write_text(json.dumps(base_seed))
    percent2 = list(base_seed)[0]

    def render23(sup_percent, dataseed, out_dir):
        return (STAGE23_YAML.replace("__SUP_PERCENT__", str(sup_percent))
                .replace("__DATASEED__", str(dataseed))
                .replace("__OUT_DIR__", out_dir))

    cfg2 = voc_root / "stage2.yaml"
    cfg2.write_text(render23(percent2, dataseed2, "output/stage2"))
    train_net_unbias.main(_args(str(cfg2), []))
    assert (voc_root / "output/stage2/model_final").exists()

    # ---- split: per-image loss scoring -> dataseed JSON
    cfg_split = voc_root / "split.yaml"
    cfg_split.write_text(SPLIT_YAML)
    split_path = voc_root / "dataseed_split.txt"
    splits.main(["--config", str(cfg_split), "--ckpt", "output/stage2/model_final",
                 "--save-path", str(split_path), "--k", str(n_imgs // 2)])
    split_seed = json.loads(split_path.read_text())
    (percent3,) = list(split_seed)
    clean = split_seed[percent3]["1"]
    assert len(clean) == n_imgs // 2
    assert int(float(percent3) / 100.0 * n_imgs) == n_imgs // 2
    assert all(0 <= i < n_imgs for i in clean)

    # ---- stage 3: semisup training past burn-in (EMA + pseudo-label steps)
    cfg3 = voc_root / "stage3.yaml"
    cfg3.write_text(render23(percent3, split_path, "output/stage3")
                    .replace("BURN_UP_STEP: 100", "BURN_UP_STEP: 1"))
    train_net_unbias.main(_args(str(cfg3), []))
    assert (voc_root / "output/stage3/model_final").exists()

    # ---- stage 3: eval the final model over voc_2007_test
    results = train_net_unbias.main(_args(str(cfg3), [], eval_only=True))
    assert "voc_2007_test" in results
    ap = results["voc_2007_test"]["bbox"]
    assert np.isfinite(ap["AP50"]), f"non-finite AP50: {ap}"
    return {"stage3_ap": ap}


@pytest.mark.slow
def test_three_stage_pipeline(pipeline_run):
    # the heavy lifting (and the inter-stage contract asserts) run in the
    # module-scoped pipeline_run fixture
    assert np.isfinite(pipeline_run["stage3_ap"]["AP50"])


@pytest.mark.slow
def test_tta_cli_smoke(voc_root, pipeline_run, monkeypatch):
    """TTA eval CLI over the stage-1 checkpoint (AVG) and stage-3 (UNION)."""
    monkeypatch.chdir(voc_root)
    import tools.train_net_test_tta as tta_cli

    assert (voc_root / "output/stage1/model_final").exists()
    ns = _args(str(voc_root / "stage1.yaml"), [
        "DATASETS.TEST", "('voc_2007_test',)",
        "DATASETS.PROPOSAL_FILES_TEST", "('datasets/proposals/mcg_voc_2007_test_d2.pkl',)",
        "TEST.AUG.MIN_SIZES", "(80, 96)",
        "TEST.AUG.MAX_SIZE", "160",
    ], eval_only=True)
    ns.strategy = "auto"
    ns.ckpt = ""
    results = tta_cli.main(ns)
    assert np.isfinite(results["voc_2007_test"]["bbox"]["AP50"])

    ns3 = _args(str(voc_root / "stage3.yaml"), [
        "TEST.AUG.MIN_SIZES", "(80, 96)",
        "TEST.AUG.MAX_SIZE", "160",
    ], eval_only=True)
    ns3.strategy = "auto"
    ns3.ckpt = ""
    results = tta_cli.main(ns3)
    assert np.isfinite(results["voc_2007_test"]["bbox"]["AP50"])


@pytest.mark.slow
def test_single_view_train_cli(voc_root, monkeypatch):
    """Single-view WSL training path (reference train_net.py): OICR head via
    GeneralizedRCNNWSL through the same stage-1 CLI."""
    monkeypatch.chdir(voc_root)
    from tools import train_net_stage1

    cfg = voc_root / "stage1_single.yaml"
    cfg.write_text(STAGE1_YAML
                   .replace('META_ARCHITECTURE: "MultiInputRCNN"',
                            'META_ARCHITECTURE: "GeneralizedRCNNWSL"')
                   .replace('NAME: "OICRPlusHeads"', 'NAME: "OICRROIHeads"')
                   .replace('OUTPUT_DIR: "output/stage1"',
                            'OUTPUT_DIR: "output/stage1_single"'))
    train_net_stage1.main(_args(str(cfg), []))
    assert (voc_root / "output/stage1_single/model_final").exists()

    # eval-only over the test split exercises the single-view predict path
    results = train_net_stage1.main(_args(str(cfg), [
        "DATASETS.TEST", "('voc_2007_test',)",
        "DATASETS.PROPOSAL_FILES_TEST", "('datasets/proposals/mcg_voc_2007_test_d2.pkl',)",
    ], eval_only=True))
    assert np.isfinite(results["voc_2007_test"]["bbox"]["AP50"])
