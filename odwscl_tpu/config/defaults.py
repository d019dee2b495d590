"""Default configuration tree.

Mirrors the reference config surface (reference wetectron/config/defaults.py)
for every option the rebuild supports, including the paper's top-level
lowercase hyperparameter keys (defaults.py:540-551 in the reference), plus a
``TPU`` section for static-shape bucketing and mesh layout, which replaces the
reference's ragged tensors and NCCL/DDP knobs.
"""

from .node import CfgNode

_C = CfgNode()

# ---------------------------------------------------------------------------
# Model
# ---------------------------------------------------------------------------
_C.MODEL = CfgNode()
_C.MODEL.META_ARCHITECTURE = "GeneralizedRCNN"
_C.MODEL.WSOD_ON = True
_C.MODEL.FASTER_RCNN = False
# fully-supervised aux heads (models/mask_head.py, keypoint_head.py) and
# the COCO segm eval task (reference defaults.py:26-28). Dead in every
# WSOD config (roi_heads.py:68 returns the weak head first).
_C.MODEL.MASK_ON = False
_C.MODEL.KEYPOINT_ON = False
# dense single-stage RetinaNet instead of the two-stage RCNN family
# (reference defaults.py:27 + rpn/retinanet); build_model dispatches on it
_C.MODEL.RETINANET_ON = False
_C.MODEL.CLS_AGNOSTIC_BBOX_REG = False
_C.MODEL.WEIGHT = ""

_C.MODEL.BACKBONE = CfgNode()
_C.MODEL.BACKBONE.CONV_BODY = "VGG16-OICR"
_C.MODEL.BACKBONE.FREEZE_CONV_BODY_AT = 2

_C.MODEL.RESNETS = CfgNode()
_C.MODEL.RESNETS.NUM_GROUPS = 1
_C.MODEL.RESNETS.WIDTH_PER_GROUP = 64
_C.MODEL.RESNETS.STRIDE_IN_1X1 = True
_C.MODEL.RESNETS.RES5_DILATION = 1
_C.MODEL.RESNETS.RES2_OUT_CHANNELS = 256
_C.MODEL.RESNETS.STEM_OUT_CHANNELS = 64

_C.MODEL.ROI_HEADS = CfgNode()
_C.MODEL.ROI_HEADS.FG_IOU_THRESHOLD = 0.5
_C.MODEL.ROI_HEADS.BG_IOU_THRESHOLD = 0.5
_C.MODEL.ROI_HEADS.BBOX_REG_WEIGHTS = (10.0, 10.0, 5.0, 5.0)
# partial-label proposal subsampling (reference defaults.py:218-220)
_C.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 512
_C.MODEL.ROI_HEADS.POSITIVE_FRACTION = 0.25
_C.MODEL.ROI_HEADS.SCORE_THRESH = 0.05
_C.MODEL.ROI_HEADS.NMS = 0.5
_C.MODEL.ROI_HEADS.DETECTIONS_PER_IMG = 100

_C.MODEL.ROI_BOX_HEAD = CfgNode()
_C.MODEL.ROI_BOX_HEAD.NUM_CLASSES = 21
_C.MODEL.ROI_BOX_HEAD.POOLER_METHOD = "ROIPool"  # ROIPool | ROIAlign
_C.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION = 7
_C.MODEL.ROI_BOX_HEAD.POOLER_SAMPLING_RATIO = 0
_C.MODEL.ROI_BOX_HEAD.POOLER_SCALES = (0.125,)
_C.MODEL.ROI_BOX_HEAD.FEATURE_EXTRACTOR = "VGG16.roi_head"
_C.MODEL.ROI_BOX_HEAD.MLP_HEAD_DIM = 4096

# supervised aux heads (WSOD_ON=False stack; reference defaults.py:254-282).
# RESOLUTION is the mask-logit side — the heads share the box pooler here
# (C4-style SHARE_BOX_FEATURE_EXTRACTOR), so it must be 2x the box pooler
# resolution (MaskPredictor's deconv doubles it; models/roi_heads.py).
_C.MODEL.ROI_MASK_HEAD = CfgNode()
_C.MODEL.ROI_MASK_HEAD.CONV_LAYERS = (256, 256, 256, 256)
_C.MODEL.ROI_MASK_HEAD.RESOLUTION = 14
_C.MODEL.ROI_MASK_HEAD.DILATION = 1
_C.MODEL.ROI_MASK_HEAD.POSTPROCESS_MASKS_THRESHOLD = 0.5

_C.MODEL.ROI_KEYPOINT_HEAD = CfgNode()
_C.MODEL.ROI_KEYPOINT_HEAD.NUM_CLASSES = 17  # keypoint count (person)

# RetinaNet (reference defaults.py:336-391; models/retinanet.py)
_C.MODEL.RETINANET = CfgNode()
_C.MODEL.RETINANET.NUM_CLASSES = 81            # including background
_C.MODEL.RETINANET.ANCHOR_SIZES = (32, 64, 128, 256, 512)
_C.MODEL.RETINANET.ASPECT_RATIOS = (0.5, 1.0, 2.0)
_C.MODEL.RETINANET.ANCHOR_STRIDES = (8, 16, 32, 64, 128)
_C.MODEL.RETINANET.OCTAVE = 2.0
_C.MODEL.RETINANET.SCALES_PER_OCTAVE = 3
_C.MODEL.RETINANET.USE_C5 = True
_C.MODEL.RETINANET.NUM_CONVS = 4
_C.MODEL.RETINANET.PRIOR_PROB = 0.01
_C.MODEL.RETINANET.FG_IOU_THRESHOLD = 0.5
_C.MODEL.RETINANET.BG_IOU_THRESHOLD = 0.4
_C.MODEL.RETINANET.LOSS_ALPHA = 0.25
_C.MODEL.RETINANET.LOSS_GAMMA = 2.0
_C.MODEL.RETINANET.BBOX_REG_WEIGHT = 4.0
_C.MODEL.RETINANET.BBOX_REG_BETA = 0.11
_C.MODEL.RETINANET.INFERENCE_TH = 0.05
_C.MODEL.RETINANET.NMS_TH = 0.4
_C.MODEL.RETINANET.PRE_NMS_TOP_N = 1000

_C.MODEL.ROI_WEAK_HEAD = CfgNode()
_C.MODEL.ROI_WEAK_HEAD.PREDICTOR = "MISTPredictor"  # WSDDNPredictor | OICRPredictor | MISTPredictor
_C.MODEL.ROI_WEAK_HEAD.LOSS = "RoIRegLoss"  # WSDDNLoss | RoILoss | RoIRegLoss
_C.MODEL.ROI_WEAK_HEAD.OICR_P = 0.0
_C.MODEL.ROI_WEAK_HEAD.REGRESS_ON = True
_C.MODEL.ROI_WEAK_HEAD.REGRESS_HEUR = "AVG"  # WSDDN | CLS-AVG | AVG | UNION
_C.MODEL.ROI_WEAK_HEAD.PARTIAL_LABELS = "none"  # none | point | scribble
_C.MODEL.ROI_WEAK_HEAD.ROI_LOSS_REFINE = False
_C.MODEL.ROI_WEAK_HEAD.NUM_REFS = 3

# ---------------------------------------------------------------------------
# DropBlock / Concrete DropBlock (feature augmentation, reference DB.*)
# ---------------------------------------------------------------------------
_C.DB = CfgNode()
_C.DB.METHOD = "none"  # none | dropblock | concrete
_C.DB.PROB = 30
_C.DB.TAU = 0.3
_C.DB.SIZE = 3
_C.DB.WEIGHT = 0.01
_C.DB.LR = 0.01

# ---------------------------------------------------------------------------
# Input / transforms (reference INPUT.*)
# ---------------------------------------------------------------------------
_C.INPUT = CfgNode()
_C.INPUT.MIN_SIZE_TRAIN = (800,)
_C.INPUT.MAX_SIZE_TRAIN = 1333
_C.INPUT.MIN_SIZE_TEST = 800
_C.INPUT.MAX_SIZE_TEST = 1333
_C.INPUT.PIXEL_MEAN = (102.9801, 115.9465, 122.7717)  # BGR order
_C.INPUT.PIXEL_STD = (1.0, 1.0, 1.0)
_C.INPUT.TO_BGR255 = True
_C.INPUT.BRIGHTNESS = 0.0
_C.INPUT.CONTRAST = 0.0
_C.INPUT.SATURATION = 0.0
_C.INPUT.HUE = 0.0
_C.INPUT.PCA = True
_C.INPUT.HORIZONTAL_FLIP_PROB_TRAIN = 0.5
_C.INPUT.VERTICAL_FLIP_PROB_TRAIN = 0.0

# ---------------------------------------------------------------------------
# Datasets / proposals
# ---------------------------------------------------------------------------
_C.DATASETS = CfgNode()
_C.DATASETS.TRAIN = ()
_C.DATASETS.TEST = ()

_C.PROPOSAL_FILES = CfgNode()
_C.PROPOSAL_FILES.TRAIN = ()
_C.PROPOSAL_FILES.TEST = ()

_C.DATALOADER = CfgNode()
_C.DATALOADER.NUM_WORKERS = 4
_C.DATALOADER.SIZE_DIVISIBILITY = 32
_C.DATALOADER.ASPECT_RATIO_GROUPING = True

# ---------------------------------------------------------------------------
# Solver (reference SOLVER.*)
# ---------------------------------------------------------------------------
_C.SOLVER = CfgNode()
_C.SOLVER.MAX_ITER = 40000
_C.SOLVER.BASE_LR = 0.001
_C.SOLVER.BIAS_LR_FACTOR = 2
_C.SOLVER.MOMENTUM = 0.9
_C.SOLVER.WEIGHT_DECAY = 0.0005
_C.SOLVER.WEIGHT_DECAY_BIAS = 0.0
_C.SOLVER.GAMMA = 0.1
_C.SOLVER.STEPS = (30000,)
_C.SOLVER.WARMUP_FACTOR = 1.0 / 3
_C.SOLVER.WARMUP_ITERS = 500
_C.SOLVER.WARMUP_METHOD = "linear"
_C.SOLVER.CHECKPOINT_PERIOD = 2500
_C.SOLVER.IMS_PER_BATCH = 16
_C.SOLVER.ITER_SIZE = -1
_C.SOLVER.CONTRA = False
_C.SOLVER.CLASS_BATCH = False  # pair images sharing a class (grouped_batch_sampler.py:124)

_C.SOLVER_CDB = CfgNode()
_C.SOLVER_CDB.BASE_LR = 0.001
_C.SOLVER_CDB.BIAS_LR_FACTOR = 2
_C.SOLVER_CDB.MOMENTUM = 0.9
_C.SOLVER_CDB.WEIGHT_DECAY = 0.0005
_C.SOLVER_CDB.WEIGHT_DECAY_BIAS = 0.0
_C.SOLVER_CDB.GAMMA = 0.1
_C.SOLVER_CDB.STEPS = (30000,)
_C.SOLVER_CDB.WARMUP_FACTOR = 1.0 / 3
_C.SOLVER_CDB.WARMUP_ITERS = 500
_C.SOLVER_CDB.WARMUP_METHOD = "linear"

# ---------------------------------------------------------------------------
# Test / TTA (reference TEST.*)
# ---------------------------------------------------------------------------
_C.TEST = CfgNode()
_C.TEST.IMS_PER_BATCH = 8
_C.TEST.DETECTIONS_PER_IMG = 100
_C.TEST.EXPECTED_RESULTS = []
_C.TEST.EXPECTED_RESULTS_SIGMA_TOL = 4
_C.TEST.BBOX_AUG = CfgNode()
_C.TEST.BBOX_AUG.ENABLED = False
_C.TEST.BBOX_AUG.HEUR = "UNION"  # UNION | AVG
_C.TEST.BBOX_AUG.H_FLIP = False
_C.TEST.BBOX_AUG.SCALES = ()
_C.TEST.BBOX_AUG.MAX_SIZE = 4000
_C.TEST.BBOX_AUG.SCALE_H_FLIP = False

# ---------------------------------------------------------------------------
# TPU-native knobs (new in the rebuild)
# ---------------------------------------------------------------------------
_C.TPU = CfgNode()
# Proposal-count padding buckets; each image's proposals are padded up to the
# smallest bucket >= its count (replaces the reference's ragged BoxLists).
_C.TPU.PROPOSAL_BUCKETS = (512, 1024, 2048, 4096)
# Image (H, W) padding: round each side up to a multiple of this after the
# /32 SIZE_DIVISIBILITY pad, to bound the number of compiled shapes.
_C.TPU.IMAGE_PAD_MULTIPLE = 128
# Train-path RoIPool window (cells per axis): exact for rois up to
# WIN*stride px, strided subsample beyond; backward traffic scales as WIN^2.
_C.TPU.POOLER_WIN = 32
# Capacity of the compacted contrastive bank (unique (image, class, proposal)
# slots; x3 views). Overflow beyond capacity is dropped lowest-hardness-first.
_C.TPU.BANK_CAPACITY = 1024
# Mesh axis names/sizes for pjit; data parallel only (matches the reference's
# DDP-only strategy, see SURVEY.md section 2.3).
_C.TPU.MESH_AXES = ("data",)
# Compute dtype for backbone/heads ("bfloat16" | "float32"); params and loss
# math stay float32 (replaces the reference's apex AMP O1).
_C.TPU.COMPUTE_DTYPE = "bfloat16"

# int8 dynamic-quantized eval matmuls (fc6/fc7) — the MXU's 2x int8 rate;
# training and the parity suites are unaffected (ops/quant.py). Validated
# against the bf16 eval path in tests/test_int8_eval.py.
_C.TPU.INT8_EVAL = False

# int8 dynamic-quantized backbone convs on the eval path (conv2_1 onward;
# ops/quant.py conv2d_int8 — per-Cout weight scales, per-tensor activation
# scale, int32 MXU accumulation at 2x the bf16 rate). Separate switch from
# INT8_EVAL: conv quantization error compounds through the stack, so its
# accuracy impact is validated separately (tests/test_int8_eval.py).
_C.TPU.INT8_EVAL_CONVS = False

# Static-calibrated activation scales for the int8 conv stack: the
# inference engine records per-layer abs-maxes over INT8_CALIB_BATCHES
# eval batches (bf16 calibration forwards across every TTA transform, so
# the scales cover all serving scales), persists them next to the
# checkpoint (OUTPUT_DIR/int8_scales.npz, reloaded on later runs), after
# which the per-batch abs-max passes (an extra HBM sweep per conv AND a
# fusion barrier) disappear — the quantize folds into the producing
# conv's epilogue. Standard post-training-quantization serving; drift
# bounded in tests/test_int8_eval.py, end-metric delta in RESULTS.md.
_C.TPU.INT8_STATIC = False

# Eval batches used for the static-int8 calibration sweep (each batch runs
# every TTA transform during calibration, so scale coverage includes the
# largest serving resolution).
_C.TPU.INT8_CALIB_BATCHES = 2

# Conv indices (VGG16-OICR layer numbering, 2..12) kept in bf16 inside the
# int8 serving stack — selective fallback for the most drift-sensitive
# layers as ranked by tests/test_int8_eval.py. Empty = quantize all.
_C.TPU.INT8_BF16_LAYERS = ()

# Space-to-depth first VGG block (ops/s2d_stem.py): conv1_1 as a K=108
# im2col GEMM on the space-to-depth input (a C_in=3 direct conv leaves
# ~97% of the MXU's 128 K-lanes zero) and conv1_2+pool1 as one
# half-resolution phase-batched conv — the full-res conv1_2 activation
# (the largest tensor in the net) never materializes. EXACT re-association
# of the same bf16 sums, same parameter tree (tests/test_s2d_stem.py);
# unlike the INT8_* modes this is not an approximation, so it defaults ON
# and applies to train and eval alike.
_C.TPU.S2D_STEM = True

# Upload eval images to the device as bf16 (engine/inference.py): EXACT
# when COMPUTE_DTYPE is bfloat16 (the backbone's first conv casts its
# input to bf16 either way; host RTNE cast == device cast), and halves
# the host->device image bytes — the dominant cost of the TTA eval loop
# on a tunneled chip (tools/bench_eval_e2e.py measured the host/transfer
# side at >10x the device compute before the round-5 pipeline fix).
_C.TPU.EVAL_TRANSFER_BF16 = True

# TTA serving fast path (engine/inference.py): upload each eval batch's
# ORIGINAL images once (at the identity scale) and derive every other
# TTA scale ON DEVICE with an antialiased triangle-filter resize built as
# two matmuls (ops/device_resize.py) — PIL.BILINEAR-convention weights,
# so pixels match the host path to ~1e-2 and the merged detections to
# sub-pixel (tests/test_device_resize.py). Cuts host->device image bytes
# ~7x (one scale instead of all) and removes the per-scale host PIL
# resizes from the loop. OFF by default: the reference-parity path
# resizes on host with PIL (bbox_aug.py:27-35); this is the labeled
# serving mode, like TPU.INT8_*.
_C.TPU.EVAL_DEVICE_RESIZE = False

# Padded per-image GT-instance slots in a supervised Batch (gt_boxes
# [B, GT_PAD, 4] + mask; the reference's ragged BoxList targets). Images
# with more instances keep the first GT_PAD (collate counts truncation).
_C.TPU.GT_PAD = 32

# GT instance bitmasks (MASK_ON) are rasterized at collate time at
# 1/MASK_RASTER_STRIDE of the padded canvas — the mask-loss target crop
# (models/mask_head.py crop_resize_bitmasks) samples bilinearly from this
# raster, so with 28x28-or-less targets a stride-4 source loses nothing
# while cutting host->device mask traffic 16x. The reference instead
# re-rasterizes polygons per matched roi on host every iteration
# (mask_head/loss.py:11-42), which it itself flags as a CPU bottleneck.
_C.TPU.MASK_RASTER_STRIDE = 4

# Proposals kept after NMS by the CAM-attention proposal generator
# (MODEL.FASTER_RCNN=True path, models/cam_proposals.py; the reference's
# hacked RPN keeps 2000, rpn.py:186 — 512 is the static-shape default
# sized to the proposal buckets).
_C.TPU.RPN_POST_NMS = 512

# ---------------------------------------------------------------------------
# Misc (reference top-level)
# ---------------------------------------------------------------------------
_C.OUTPUT_DIR = "."
_C.SEED = 1234
_C.DTYPE = "float32"
_C.PATHS_CATALOG = ""

# Paper's sweepable hyperparameters — top-level lowercase keys, set via CLI
# opts exactly like the reference (reference defaults.py:540-551).
_C.cluster = 5
_C.nms = 0.1
_C.lmda = 0.1
_C.pos_update = 0
_C.thres = 0.5
_C.iou = 0.5
_C.temp = 0.2
_C.loss = "supconv2"  # supcon | supconv2
_C.cls_hp = 1.0
_C.reg_hp = 1.0
_C.min_size = 0.0
_C.lmda2 = 0.0


def get_default_cfg() -> CfgNode:
    return _C.clone()
