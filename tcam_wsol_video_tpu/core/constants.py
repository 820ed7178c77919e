"""Global vocabulary for the TPU-native TCAM WSOL-video framework.

Capability parity with the reference constants namespace
(/root/reference/dlib/configure/constants.py:1-376): tasks, pooling heads,
CAM methods, datasets, dataset modes, checkpoint types, time-dependency
modes, seed techniques and ROI selection modes.  Values that are part of the
on-disk metadata contract (split names, file names) are kept identical so
the same `folds/` metadata files work unchanged.
"""

# ---------------------------------------------------------------- tasks
STD_CL = "STD_CL"          # standard classification (CAM stage 1)
F_CL = "F_CL"              # FCAM: U-Net decoder distillation (images)
TCAM = "TCAM"              # TCAM: temporal CAM distillation (videos)
C_BOX = "C_BOX"            # direct box regression
SEG = "SEG"                # plain segmentation (vestigial in the reference)

TASKS = (STD_CL, F_CL, TCAM, C_BOX, SEG)

# ---------------------------------------------------------------- archs
STDCLASSIFIER = "STDClassifier"
UNETFCAM = "UnetFCAM"
UNETTCAM = "UnetTCAM"
DENSEBOXNET = "DenseBoxNet"

ARCHS = (STDCLASSIFIER, UNETFCAM, UNETTCAM, DENSEBOXNET)

# ------------------------------------------------------------- poolings
GAP = "GAP"
WGAP = "WGAP"
MAX_POOL = "MaxPool"
LSE_POOL = "LogSumExpPool"
WILDCAT = "WildCatCLHead"

SPATIAL_POOLINGS = (GAP, WGAP, MAX_POOL, LSE_POOL, WILDCAT)

# ---------------------------------------------------------- CAM methods
# reference: dlib/configure/constants.py:25-89
METHOD_CAM = "CAM"
METHOD_SCORECAM = "ScoreCAM"
METHOD_SSCAM = "SSCAM"
METHOD_ISCAM = "ISCAM"
METHOD_GRADCAM = "GradCam"
METHOD_GRADCAMPP = "GradCAMpp"
METHOD_SMOOTHGRADCAMPP = "SmoothGradCAMpp"
METHOD_XGRADCAM = "XGradCAM"
METHOD_LAYERCAM = "LayerCAM"
METHOD_MAXPOOL = "MaxPool"
METHOD_LSE = "LogSumExpPool"
METHOD_WILDCAT = "WildCat"
METHOD_GAP = "GAP"

CAM_METHODS = (
    METHOD_CAM, METHOD_SCORECAM, METHOD_SSCAM, METHOD_ISCAM, METHOD_GRADCAM,
    METHOD_GRADCAMPP, METHOD_SMOOTHGRADCAMPP, METHOD_XGRADCAM,
    METHOD_LAYERCAM, METHOD_MAXPOOL, METHOD_LSE, METHOD_WILDCAT, METHOD_GAP,
)

# method -> pooling head it requires (reference constants.py:55-73)
METHOD_2_POOLINGHEAD = {
    METHOD_CAM: WGAP,
    METHOD_SCORECAM: WGAP,
    METHOD_SSCAM: WGAP,
    METHOD_ISCAM: WGAP,
    METHOD_GRADCAM: WGAP,
    METHOD_GRADCAMPP: WGAP,
    METHOD_SMOOTHGRADCAMPP: WGAP,
    METHOD_XGRADCAM: WGAP,
    METHOD_LAYERCAM: WGAP,
    METHOD_MAXPOOL: MAX_POOL,
    METHOD_LSE: LSE_POOL,
    METHOD_WILDCAT: WILDCAT,
    METHOD_GAP: GAP,
}

# methods that need gradients at eval time (reference constants.py:75-89)
METHOD_REQU_GRAD = {
    METHOD_CAM: False,
    METHOD_SCORECAM: False,
    METHOD_SSCAM: False,
    METHOD_ISCAM: False,
    METHOD_GRADCAM: True,
    METHOD_GRADCAMPP: True,
    METHOD_SMOOTHGRADCAMPP: True,
    METHOD_XGRADCAM: True,
    METHOD_LAYERCAM: True,
    METHOD_MAXPOOL: False,
    METHOD_LSE: False,
    METHOD_WILDCAT: False,
    METHOD_GAP: False,
}

# ------------------------------------------------------------- encoders
RESNET50 = "resnet50"
VGG16 = "vgg16"
INCEPTIONV3 = "inceptionv3"

ENCODERS = (RESNET50, VGG16, INCEPTIONV3)

# ------------------------------------------------------------- datasets
CUB = "CUB"
ILSVRC = "ILSVRC"
OpenImages = "OpenImages"
YTOV1 = "YouTube-Objects-v1.0"
YTOV22 = "YouTube-Objects-v2.2"

DATASETS = (CUB, ILSVRC, OpenImages, YTOV1, YTOV22)
VIDEO_DATASETS = (YTOV1, YTOV22)
BUCKETED_DATASETS = (ILSVRC,)

NUMBER_CLASSES = {
    CUB: 200,
    ILSVRC: 1000,
    OpenImages: 100,
    YTOV1: 10,
    YTOV22: 10,
}

# ---------------------------------------------------------------- splits
TRAINSET = "train"
VALIDSET = "val"
TESTSET = "test"
TESTSET_VIDEO_DEMO = "test-video-demo"

SPLITS = (TRAINSET, VALIDSET, TESTSET)

# ----------------------------------------------------------- image sizes
CROP_SIZE = 224
RESIZE_SIZE = 256

# ----------------------------------------------------- dataset file modes
DS_SHOTS = "shots"     # train ids are shot directories (videos)
DS_FRAMES = "frames"   # ids are frame files
DS_MODES = (DS_SHOTS, DS_FRAMES)

# ---------------------------------------------------- checkpoint selection
BEST_CL = "best_classification"
BEST_LOC = "best_localization"
CHECKPOINT_TYPES = (BEST_CL, BEST_LOC)

# rolling-checkpoint payload keys
CHP_M = "model"
CHP_O = "optimizer"
CHP_LR = "lr_scheduler"
CHP_T = "t"            # ELB temperature (the reference checkpoints it:
                       # /root/reference/dlib/configure/constants.py:361)
CHP_BEST_M = "best_model"
CHP_CP = "checkpoint"

# ------------------------------------------- size estimation (C_BOX priors)
# reference constants.py:325-326; SIZE_DATA takes per-class min sizes from
# the validation split's GT boxes (wsol_loader.build_size_priors :658-691)
SIZE_DATA = "size_data"
SIZE_CONST = "size_constant"
SIZE_TYPES = (SIZE_DATA, SIZE_CONST)

# ------------------------------------------------ eval speed/fidelity knobs
# validation uses a coarser cam-threshold sweep above this dataset size
# (reference constants.py:294)
FAST_EVAL_SAMPLES_THRESHOLD = 1000
VALID_FAST_CAM_CURVE_INTERVAL = 0.004

# ---------------------------------------------------- time dependency modes
TIME_BEFORE = "before"
TIME_AFTER = "after"
TIME_BEFORE_AFTER = "before-after"
TIME_INSTANT = "instant"
TIME_DEPENDENCY = (TIME_BEFORE, TIME_AFTER, TIME_BEFORE_AFTER, TIME_INSTANT)

# ------------------------------------------------------------ seeding techs
SEED_UNIFORM = "seed_uniform"
SEED_WEIGHTED = "seed_weighted"
SEED_TECHS = (SEED_UNIFORM, SEED_WEIGHTED)

# --------------------------------------------------------- ROI select modes
ROI_ALL = "roi_all"
ROI_H_DENSITY = "roi_high_density"
ROI_LARGEST = "roi_largest"
ROI_SELECT = (ROI_ALL, ROI_H_DENSITY, ROI_LARGEST)

# ------------------------------------------------------------- seg mode
BINARY_MODE = "binary"

# --------------------------------------------------------------- metadata
RELATIVE_META_ROOT = "folds/wsol-done-right-splits"

# segmentation alignment ignore index
SEG_IGNORE_IDX = -255

# ----------------------------------------------------------------- mesh
# logical mesh axis names for jax.sharding; the reference is data-parallel
# only (DDP: /root/reference/dlib/parallel/my_ddp.py) but we lay out a 2-D
# mesh so tensor-parallel shardings can be annotated where useful.
MESH_DATA_AXIS = "dp"
MESH_MODEL_AXIS = "mp"

# ImageNet normalization (shared with the reference eval protocol)
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)
