"""Default configuration tree.

Key-compatible with the reference's detectron2 + WSL + ubteacher config surface so
the released YAMLs parse unchanged (reference: uwsod/detectron2/config/defaults.py,
uwsod/projects/WSL/wsl/config/defaults.py:7-88, unbias/ubteacher/config.py:5-54).
TPU-specific knobs (static capacities, shape bucketing, dtypes, mesh) live under
the new ``TPU`` namespace — these have no reference counterpart because the
reference relies on dynamic shapes; XLA requires static ones.
"""
from .cfg_node import CfgNode as CN


def get_default_cfg() -> CN:
    _C = CN()
    _C.VERSION = 2
    _C.SEED = -1
    _C.OUTPUT_DIR = "./output"
    _C.VIS_PERIOD = 0
    _C.CUDNN_BENCHMARK = False

    # ------------------------------------------------------------- MODEL
    _C.MODEL = CN()
    _C.MODEL.META_ARCHITECTURE = "GeneralizedRCNN"
    _C.MODEL.DEVICE = "tpu"
    _C.MODEL.WEIGHTS = ""
    _C.MODEL.MASK_ON = False
    _C.MODEL.KEYPOINT_ON = False
    _C.MODEL.LOAD_PROPOSALS = False
    # BGR order; reference detectron2 defaults (uwsod/detectron2/config/defaults.py:39)
    _C.MODEL.PIXEL_MEAN = [103.530, 116.280, 123.675]
    _C.MODEL.PIXEL_STD = [1.0, 1.0, 1.0]

    _C.MODEL.BACKBONE = CN()
    _C.MODEL.BACKBONE.NAME = "build_resnet_backbone"
    _C.MODEL.BACKBONE.FREEZE_AT = 2

    _C.MODEL.VGG = CN()
    _C.MODEL.VGG.DEPTH = 16
    _C.MODEL.VGG.OUT_FEATURES = ["plain5"]
    _C.MODEL.VGG.CONV5_DILATION = 1

    _C.MODEL.RESNETS = CN()
    _C.MODEL.RESNETS.DEPTH = 50
    _C.MODEL.RESNETS.OUT_FEATURES = ["res4"]
    _C.MODEL.RESNETS.NUM_GROUPS = 1
    _C.MODEL.RESNETS.NORM = "FrozenBN"
    _C.MODEL.RESNETS.WIDTH_PER_GROUP = 64
    _C.MODEL.RESNETS.STRIDE_IN_1X1 = True
    _C.MODEL.RESNETS.RES5_DILATION = 1
    _C.MODEL.RESNETS.RES2_OUT_CHANNELS = 256
    _C.MODEL.RESNETS.STEM_OUT_CHANNELS = 64
    _C.MODEL.RESNETS.DEFORM_ON_PER_STAGE = [False, False, False, False]

    _C.MODEL.FPN = CN()
    _C.MODEL.FPN.IN_FEATURES = []
    _C.MODEL.FPN.OUT_CHANNELS = 256
    _C.MODEL.FPN.NORM = ""
    _C.MODEL.FPN.FUSE_TYPE = "sum"

    _C.MODEL.ANCHOR_GENERATOR = CN()
    _C.MODEL.ANCHOR_GENERATOR.SIZES = [[32, 64, 128, 256, 512]]
    _C.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS = [[0.5, 1.0, 2.0]]
    _C.MODEL.ANCHOR_GENERATOR.ANGLES = [[-90, 0, 90]]
    _C.MODEL.ANCHOR_GENERATOR.OFFSET = 0.0

    _C.MODEL.PROPOSAL_GENERATOR = CN()
    _C.MODEL.PROPOSAL_GENERATOR.NAME = "RPN"
    _C.MODEL.PROPOSAL_GENERATOR.MIN_SIZE = 0

    _C.MODEL.RPN = CN()
    _C.MODEL.RPN.HEAD_NAME = "StandardRPNHead"
    _C.MODEL.RPN.IN_FEATURES = ["res4"]
    _C.MODEL.RPN.BOUNDARY_THRESH = -1
    _C.MODEL.RPN.IOU_THRESHOLDS = [0.3, 0.7]
    _C.MODEL.RPN.IOU_LABELS = [0, -1, 1]
    _C.MODEL.RPN.BATCH_SIZE_PER_IMAGE = 256
    _C.MODEL.RPN.POSITIVE_FRACTION = 0.5
    _C.MODEL.RPN.BBOX_REG_WEIGHTS = (1.0, 1.0, 1.0, 1.0)
    _C.MODEL.RPN.BBOX_REG_LOSS_TYPE = "smooth_l1"
    _C.MODEL.RPN.BBOX_REG_LOSS_WEIGHT = 1.0
    _C.MODEL.RPN.SMOOTH_L1_BETA = 0.0
    _C.MODEL.RPN.LOSS_WEIGHT = 1.0
    _C.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 12000
    _C.MODEL.RPN.PRE_NMS_TOPK_TEST = 6000
    _C.MODEL.RPN.POST_NMS_TOPK_TRAIN = 2000
    _C.MODEL.RPN.POST_NMS_TOPK_TEST = 1000
    _C.MODEL.RPN.NMS_THRESH = 0.7
    _C.MODEL.RPN.CONV_DIMS = [-1]
    # ubteacher fork extras (unbias/ubteacher/config.py:12-13)
    _C.MODEL.RPN.UNSUP_LOSS_WEIGHT = 1.0
    _C.MODEL.RPN.LOSS = "CrossEntropy"

    _C.MODEL.ROI_HEADS = CN()
    _C.MODEL.ROI_HEADS.NAME = "Res5ROIHeads"
    _C.MODEL.ROI_HEADS.NUM_CLASSES = 80
    _C.MODEL.ROI_HEADS.IN_FEATURES = ["res4"]
    _C.MODEL.ROI_HEADS.IOU_THRESHOLDS = [0.5]
    _C.MODEL.ROI_HEADS.IOU_LABELS = [0, 1]
    _C.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 512
    _C.MODEL.ROI_HEADS.POSITIVE_FRACTION = 0.25
    _C.MODEL.ROI_HEADS.SCORE_THRESH_TEST = 0.05
    _C.MODEL.ROI_HEADS.NMS_THRESH_TEST = 0.5
    _C.MODEL.ROI_HEADS.PROPOSAL_APPEND_GT = True
    # ubteacher fork adds LOSS selector (unbias/ubteacher/modeling/roi_heads/roi_heads.py:405)
    _C.MODEL.ROI_HEADS.LOSS = "CrossEntropy"

    _C.MODEL.ROI_BOX_HEAD = CN()
    _C.MODEL.ROI_BOX_HEAD.NAME = ""
    _C.MODEL.ROI_BOX_HEAD.BBOX_REG_LOSS_TYPE = "smooth_l1"
    _C.MODEL.ROI_BOX_HEAD.BBOX_REG_LOSS_WEIGHT = 1.0
    _C.MODEL.ROI_BOX_HEAD.BBOX_REG_WEIGHTS = (10.0, 10.0, 5.0, 5.0)
    _C.MODEL.ROI_BOX_HEAD.SMOOTH_L1_BETA = 0.0
    _C.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION = 14
    _C.MODEL.ROI_BOX_HEAD.POOLER_SAMPLING_RATIO = 0
    _C.MODEL.ROI_BOX_HEAD.POOLER_TYPE = "ROIAlignV2"
    _C.MODEL.ROI_BOX_HEAD.NUM_FC = 0
    _C.MODEL.ROI_BOX_HEAD.FC_DIM = 1024
    _C.MODEL.ROI_BOX_HEAD.NUM_CONV = 0
    _C.MODEL.ROI_BOX_HEAD.CONV_DIM = 256
    _C.MODEL.ROI_BOX_HEAD.NORM = ""
    _C.MODEL.ROI_BOX_HEAD.CLS_AGNOSTIC_BBOX_REG = False
    _C.MODEL.ROI_BOX_HEAD.TRAIN_ON_PRED_BOXES = False
    _C.MODEL.ROI_BOX_HEAD.DAN_DIM = [4096, 4096]

    _C.MODEL.ROI_MASK_HEAD = CN()
    _C.MODEL.ROI_MASK_HEAD.NAME = "MaskRCNNConvUpsampleHead"
    _C.MODEL.ROI_MASK_HEAD.POOLER_RESOLUTION = 14
    _C.MODEL.ROI_MASK_HEAD.POOLER_SAMPLING_RATIO = 0
    _C.MODEL.ROI_MASK_HEAD.NUM_CONV = 0
    _C.MODEL.ROI_MASK_HEAD.CONV_DIM = 256
    _C.MODEL.ROI_MASK_HEAD.NORM = ""
    _C.MODEL.ROI_MASK_HEAD.CLS_AGNOSTIC_MASK = False
    _C.MODEL.ROI_MASK_HEAD.POOLER_TYPE = "ROIAlignV2"

    _C.MODEL.SEM_SEG_HEAD = CN()
    _C.MODEL.SEM_SEG_HEAD.NAME = "SemSegFPNHead"
    _C.MODEL.SEM_SEG_HEAD.NUM_CLASSES = 54
    _C.MODEL.SEM_SEG_HEAD.ASSP_CONVS_DIM = [1024, 1024]
    _C.MODEL.SEM_SEG_HEAD.MASK_SOFTMAX = False
    _C.MODEL.SEM_SEG_HEAD.CONSTRAINT = False

    # ------------------------------------------------------------- INPUT
    _C.INPUT = CN()
    _C.INPUT.MIN_SIZE_TRAIN = (800,)
    _C.INPUT.MIN_SIZE_TRAIN_SAMPLING = "choice"
    _C.INPUT.MAX_SIZE_TRAIN = 1333
    _C.INPUT.MIN_SIZE_TEST = 800
    _C.INPUT.MAX_SIZE_TEST = 1333
    _C.INPUT.RANDOM_FLIP = "horizontal"
    _C.INPUT.CROP = CN()
    _C.INPUT.CROP.ENABLED = False
    _C.INPUT.CROP.TYPE = "relative_range"
    _C.INPUT.CROP.SIZE = [0.9, 0.9]
    _C.INPUT.FORMAT = "BGR"
    _C.INPUT.MASK_FORMAT = "polygon"

    # ------------------------------------------------------------- DATA
    _C.DATASETS = CN()
    _C.DATASETS.TRAIN = ()
    _C.DATASETS.TEST = ()
    _C.DATASETS.VAL = ()
    _C.DATASETS.PROPOSAL_FILES_TRAIN = ()
    _C.DATASETS.PROPOSAL_FILES_TEST = ()
    _C.DATASETS.PROPOSAL_FILES_VAL = ()
    _C.DATASETS.PRECOMPUTED_PROPOSAL_TOPK_TRAIN = 2000
    _C.DATASETS.PRECOMPUTED_PROPOSAL_TOPK_TEST = 1000
    _C.DATASETS.CROSS_DATASET = False

    _C.DATALOADER = CN()
    _C.DATALOADER.NUM_WORKERS = 4
    _C.DATALOADER.ASPECT_RATIO_GROUPING = True
    _C.DATALOADER.SAMPLER_TRAIN = "TrainingSampler"
    _C.DATALOADER.REPEAT_THRESHOLD = 0.0
    _C.DATALOADER.FILTER_EMPTY_ANNOTATIONS = True
    # ubteacher semi-sup division (unbias/ubteacher/config.py)
    _C.DATALOADER.SUP_PERCENT = 100.0
    _C.DATALOADER.RANDOM_DATA_SEED = 0
    _C.DATALOADER.RANDOM_DATA_SEED_PATH = "dataseed/COCO_supervision.txt"

    # ------------------------------------------------------------- SOLVER
    _C.SOLVER = CN()
    _C.SOLVER.LR_SCHEDULER_NAME = "WarmupMultiStepLR"
    _C.SOLVER.MAX_ITER = 40000
    _C.SOLVER.BASE_LR = 0.001
    _C.SOLVER.MOMENTUM = 0.9
    _C.SOLVER.NESTEROV = False
    _C.SOLVER.WEIGHT_DECAY = 0.0001
    _C.SOLVER.WEIGHT_DECAY_NORM = 0.0
    _C.SOLVER.GAMMA = 0.1
    _C.SOLVER.STEPS = (30000,)
    _C.SOLVER.FACTOR_LIST = (1,)
    _C.SOLVER.WARMUP_FACTOR = 1.0 / 1000
    _C.SOLVER.WARMUP_ITERS = 1000
    _C.SOLVER.WARMUP_METHOD = "linear"
    _C.SOLVER.CHECKPOINT_PERIOD = 5000
    _C.SOLVER.IMS_PER_BATCH = 16
    _C.SOLVER.IMG_PER_BATCH_LABEL = 16
    _C.SOLVER.IMG_PER_BATCH_UNLABEL = 16
    _C.SOLVER.BIAS_LR_FACTOR = 1.0
    _C.SOLVER.WEIGHT_DECAY_BIAS = 0.0001
    _C.SOLVER.REFERENCE_WORLD_SIZE = 0
    _C.SOLVER.REFINE_LR_SCALE = 1.0
    _C.SOLVER.REFINE_SCALE_ON = False
    _C.SOLVER.AMP = False
    _C.SOLVER.CLIP_GRADIENTS = CN()
    _C.SOLVER.CLIP_GRADIENTS.ENABLED = False
    _C.SOLVER.CLIP_GRADIENTS.CLIP_TYPE = "value"
    _C.SOLVER.CLIP_GRADIENTS.CLIP_VALUE = 1.0
    _C.SOLVER.CLIP_GRADIENTS.NORM_TYPE = 2.0

    # ------------------------------------------------------------- TEST
    _C.TEST = CN()
    _C.TEST.EVAL_PERIOD = 0
    _C.TEST.EVAL_TRAIN = True
    _C.TEST.EXPECTED_RESULTS = []
    _C.TEST.DETECTIONS_PER_IMAGE = 100
    _C.TEST.AUG = CN()
    _C.TEST.AUG.ENABLED = False
    _C.TEST.AUG.MIN_SIZES = (400, 500, 600, 700, 800, 900, 1000, 1100, 1200)
    _C.TEST.AUG.MAX_SIZE = 4000
    _C.TEST.AUG.FLIP = True
    _C.TEST.PRECISE_BN = CN()
    _C.TEST.PRECISE_BN.ENABLED = False
    _C.TEST.PRECISE_BN.NUM_ITER = 200
    _C.TEST.VAL_LOSS = True
    _C.TEST.EVALUATOR = "COCOeval"

    # ------------------------------------------------------------- WSL (stage 1)
    # reference: uwsod/projects/WSL/wsl/config/defaults.py:7-88
    _C.WSL = CN()
    _C.WSL.VIS_TEST = False
    _C.WSL.ITER_SIZE = 1
    _C.WSL.MEAN_LOSS = True
    _C.WSL.SIZE_EPOCH = 5000
    _C.WSL.CMIL = False
    _C.WSL.USE_OBN = True
    _C.WSL.CSC_MAX_ITER = 35000
    _C.WSL.REFINE_NUM = 3
    _C.WSL.REFINE_REG = [False, False, False]
    _C.WSL.HAS_GAM = False
    _C.WSL.REFINE_MIST = False
    _C.WSL.MIST_P = 0.10
    _C.WSL.MIST_THRE = 0.05
    _C.WSL.MIST_TYPE = "nms"  # "nms" or "wetectron"
    _C.WSL.CLS_AGNOSTIC_BBOX_KNOWN = False
    _C.WSL.CASCADE_ON = False
    _C.WSL.SAMPLING = CN()
    _C.WSL.SAMPLING.SAMPLING_ON = False
    _C.WSL.SAMPLING.SAMPLING_TYPE = "high"
    _C.WSL.SAMPLING.LB = 100
    _C.WSL.SAMPLING.LAMBDA_MAX = 0.51
    _C.WSL.SAMPLING.IOU_THRESHOLDS = [[0.5], [0.5], [0.5], [0.5]]
    _C.WSL.SAMPLING.IOU_LABELS = [[0, 1], [0, 1], [0, 1], [0, 1]]
    _C.WSL.SAMPLING.BATCH_SIZE_PER_IMAGE = [4096, 4096, 4096, 4096]
    _C.WSL.SAMPLING.POSITIVE_FRACTION = [1.0, 1.0, 1.0, 1.0]

    _C.OICRPLUS = CN()
    _C.OICRPLUS.BBOX_UPDATE = False
    _C.OICRPLUS.PROPOSAL_NUM = 100000

    _C.WSODEVAL = CN()
    _C.WSODEVAL.SAVE_DETECTION_RESULT = False
    _C.WSODEVAL.SAVE_PATH = ""

    _C.MODEL.MRRP = CN()
    _C.MODEL.MRRP.MRRP_ON = False
    _C.MODEL.MRRP.NUM_BRANCH = 3
    _C.MODEL.MRRP.BRANCH_DILATIONS = [1, 2, 3]
    _C.MODEL.MRRP.MRRP_STAGE = "res4"
    _C.MODEL.MRRP.TEST_BRANCH_IDX = 1

    # --------------------------------------------------- SEMISUPNET (stages 2-3)
    # reference: unbias/ubteacher/config.py:5-54
    _C.SEMISUPNET = CN()
    _C.SEMISUPNET.Trainer = "ubteacher"
    _C.SEMISUPNET.BBOX_THRESHOLD = 0.7
    _C.SEMISUPNET.PSEUDO_BBOX_SAMPLE = "thresholding"
    _C.SEMISUPNET.TEACHER_UPDATE_ITER = 1
    _C.SEMISUPNET.BURN_UP_STEP = 12000
    _C.SEMISUPNET.EMA_KEEP_RATE = 0.9996
    _C.SEMISUPNET.UNSUP_LOSS_WEIGHT = 4.0
    _C.SEMISUPNET.SUP_LOSS_WEIGHT = 0.5
    _C.SEMISUPNET.LOSS_WEIGHT_TYPE = "standard"
    _C.SEMISUPNET.BURN_UP_WITH_STRONG_AUG = False
    _C.SEMISUPNET.HAS_MULTI_LABEL = False
    _C.SEMISUPNET.EVAL_TEACHER = True

    _C.EMAMODEL = CN()
    _C.EMAMODEL.SUP_CONSIST = True

    # ------------------------------------------------------------- TPU (new)
    # Static-shape / sharding knobs with no reference counterpart: XLA needs
    # fixed capacities where the reference used dynamic tensors (SURVEY.md §7).
    _C.TPU = CN()
    _C.TPU.PROPOSAL_CAPACITY = 4096      # padded proposal slots per image
    # Optional ascending proposal-capacity buckets, e.g. (1024, 2048, 4096).
    # Each image pads to the smallest bucket holding its real proposal count
    # instead of always paying PROPOSAL_CAPACITY: ROI pool + box-head cost is
    # linear in P, and the reference's dynamic shapes only ever pay the true
    # count (topk cap 4000, Base-RCNN-DilatedC5.yaml:5). One jit entry per
    # bucket. Empty = single static capacity.
    _C.TPU.PROPOSAL_BUCKETS = ()
    _C.TPU.PGT_SEED_CAPACITY = 1024      # MIST seed candidates kept before NMS
    _C.TPU.PGT_CAPACITY = 128            # pseudo-GT slots after NMS
    _C.TPU.DETECTIONS_CAPACITY = 256     # padded per-image detection slots pre-topk
    _C.TPU.IMAGE_SIZE_DIVISIBILITY = 64  # pad image H,W to multiples of this
    _C.TPU.MAX_IMAGE_BUCKETS = 12        # cap on distinct padded shapes (jit cache)
    _C.TPU.COMPUTE_DTYPE = "bfloat16"    # matmul/conv compute dtype
    _C.TPU.PARAM_DTYPE = "float32"
    _C.TPU.MESH_AXES = ("data",)         # data-parallel over ICI by default
    # 0 = mesh over all visible devices; N>0 = first N only (1 = no mesh).
    # Tests pin 1: on a 1-core host, 8 virtual CPU devices spin-contend in
    # every collective and a tiny ubteacher step grinds for minutes; the
    # SPMD path has its own dedicated mesh tests (test_engine.py).
    _C.TPU.MESH_DEVICES = 0
    # >1 partitions the mesh (data, model) and shards the DAN fc stack
    # Megatron-style over the "model" axis (parallel/sharding_rules.py);
    # 1 = pure data parallelism like the reference's DDP
    _C.TPU.MODEL_AXIS_SIZE = 1
    _C.TPU.REMAT_BACKBONE = False        # jax.checkpoint over backbone stages
    # ROIPool implementation: "auto" = fused Pallas kernel on TPU when the
    # shape qualifies (ops/pallas/roi_pool_fused.py), else the XLA doubling
    # table; "table" / "pallas" force one path
    _C.TPU.POOL_IMPL = "auto"
    # row-chunk count for the multi-view pool's gather/scatter: >1 caps the
    # live gathered-corner temporaries at 1/n of ~820 MB/view, required for
    # per-chip batch >= 4 in 16 GB HBM (ops/roi_pool.py:_pool_row_chunks);
    # 0 = the SOS_POOL_ROW_CHUNKS env default (1 = unchunked)
    _C.TPU.POOL_ROW_CHUNKS = 0
    # optimizer steps executed per dispatch (lax.scan superstep) — amortizes
    # the per-execute host/tunnel overhead; periods (checkpoint/eval/writer)
    # should be multiples of this
    _C.TPU.SCAN_STEPS = 1
    # PRNG implementation for training randomness (dropout, augment draws).
    # "unsafe_rbg" uses the TPU's hardware RNG path: the default threefry
    # costs ~7 ms/step generating the two (16K, 4096) DAN dropout masks at
    # stage-1 production shapes. Only statistical properties differ; set
    # "threefry2x32" for torch-independent bit-reproducibility instead.
    _C.TPU.PRNG_IMPL = "unsafe_rbg"

    return _C
