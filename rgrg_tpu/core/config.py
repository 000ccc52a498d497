"""Typed configuration for the whole framework.

Defaults preserve the reference hyperparameters for comparability:
  - detector anchors / RPN / RoI settings: reference `object_detector.py:67-131`
  - training stage settings: reference `run_configurations.py` and
    `training_script_object_detector.py:33-49`
All configs are frozen dataclasses so they are hashable and can be closed
over by `jax.jit` as static values.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

from rgrg_tpu.core import constants as C


@dataclasses.dataclass(frozen=True)
class AnchorConfig:
    """Anchor grid for the 512x512 input / 16x16 C5 feature map.

    10 sizes x 16 aspect ratios = 160 anchors per location, tuned for chest
    anatomy (spine AR ~= 8.0, abdomen ~= 0.6); reference object_detector.py:78-81.
    """

    sizes: Tuple[float, ...] = (20, 40, 60, 80, 100, 120, 140, 160, 180, 300)
    aspect_ratios: Tuple[float, ...] = (
        0.2, 0.25, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 1.0, 1.3, 1.5, 2.1, 2.6, 3.0, 5.0, 8.0,
    )
    stride: int = C.BACKBONE_STRIDE
    grid_size: int = C.FEATURE_MAP_SIZE

    @property
    def num_anchors_per_location(self) -> int:
        return len(self.sizes) * len(self.aspect_ratios)

    @property
    def num_anchors(self) -> int:
        return self.num_anchors_per_location * self.grid_size * self.grid_size


@dataclasses.dataclass(frozen=True)
class RPNConfig:
    """Region proposal network settings; reference object_detector.py:86-97."""

    fg_iou_thresh: float = 0.7
    bg_iou_thresh: float = 0.3
    batch_size_per_image: int = 256
    positive_fraction: float = 0.5
    pre_nms_top_n_train: int = 2000
    pre_nms_top_n_test: int = 1000
    post_nms_top_n_train: int = 2000
    post_nms_top_n_test: int = 1000
    nms_thresh: float = 0.7
    score_thresh: float = 0.0
    min_box_size: float = 1e-3

    def pre_nms_top_n(self, train: bool) -> int:
        return self.pre_nms_top_n_train if train else self.pre_nms_top_n_test

    def post_nms_top_n(self, train: bool) -> int:
        return self.post_nms_top_n_train if train else self.post_nms_top_n_test


@dataclasses.dataclass(frozen=True)
class RoIConfig:
    """RoI head settings; reference object_detector.py:101-129.

    Note: the reference passes score_thresh/nms_thresh/detections_per_img to
    torchvision RoIHeads but never uses them — top-1-per-class decoding
    replaces the NMS postprocess (SURVEY.md §2.1 "Vestigial params"). We do
    not carry those dead knobs.
    """

    output_size: int = 8          # RoIAlign output resolution
    sampling_ratio: int = 2       # RoIAlign samples per bin edge
    representation_size: int = 1024  # TwoMLPHead width
    # training-time proposal sampling
    fg_iou_thresh: float = 0.5
    bg_iou_thresh: float = 0.5
    batch_size_per_image: int = 512
    positive_fraction: float = 0.25
    # box regression weights (torchvision RoIHeads default)
    bbox_reg_weights: Tuple[float, float, float, float] = (10.0, 10.0, 5.0, 5.0)
    # proposals processed per RoI-head chunk: bounds the pooled-feature
    # intermediate (B * chunk * 8*8*2048) instead of materializing all K
    proposal_chunk: int = 256
    # serving knob: compact NMS survivors to this many proposals before the
    # RoI head (None = keep all post-NMS slots — reference parity). Exact
    # whenever survivors <= budget; otherwise drops the lowest-scored
    # survivors, i.e. behaves like a smaller post_nms_top_n. MUST be
    # certified per served checkpoint with
    # scripts/validate_proposal_budget.py (evidence:
    # docs/artifacts/proposal_budget_validation.json): survivors shrink as
    # training converges (668 mean at 150 steps -> 349 mean / 416 max at
    # 1000 steps on the synthetic corpus), and a budget is EXACT iff it
    # >= that checkpoint's survivors_max (600 was byte-exact, 300 was
    # not). Default stays None; never set below a certified bound.
    inference_proposal_budget: Optional[int] = None


@dataclasses.dataclass(frozen=True)
class DetectorConfig:
    anchors: AnchorConfig = AnchorConfig()
    rpn: RPNConfig = RPNConfig()
    roi: RoIConfig = RoIConfig()
    num_classes: int = C.NUM_DETECTOR_CLASSES  # 29 regions + background
    image_size: int = C.IMAGE_SIZE
    # ResNet stage depths; (3, 4, 6, 3) == ResNet-50 (reference backbone).
    # Smaller values build structurally-identical but shallow backbones for
    # fast-compiling dry runs and tests.
    backbone_stages: Tuple[int, int, int, int] = (3, 4, 6, 3)
    # computation dtype for conv/dense/RoIAlign ("bfloat16" for serving —
    # halves HBM traffic of the pooled-feature materialization and runs the
    # MXU at full bf16 rate; "float32" for parity testing). Params stay f32.
    dtype: str = "float32"
    # Pallas NMS dispatch (ops/nms_pallas.py); keep False for f32 parity.
    use_pallas_nms: bool = False
    # RoIAlign formulation: None = auto (the fused outer-product matmul for
    # bf16 serving compute, the separable 2-einsum for f32 parity);
    # "separable" | "fused" | "pallas" force one. Measured at serving chunk
    # shapes (B=24, 256 ROIs, docs/artifacts/roi_pooled_formulations.json):
    # fused 2.43 ms vs separable 12.57 / pallas 13.27 — the separable form's
    # [B, N, P, W, C] HBM intermediate is the cost, not the FLOPs.
    roi_align_impl: Optional[str] = None


@dataclasses.dataclass(frozen=True)
class ClassifierConfig:
    """The two binary-classifier MLP heads over region features.

    Reference binary_classifier_region_selection.py:11-22 and
    binary_classifier_region_abnormal.py:18-29.
    """

    hidden_dims: Tuple[int, int] = (512, 128)
    selection_pos_weight: float = 2.2
    abnormal_pos_weight: float = 6.0
    # logit threshold -1.0 == probability 0.269
    logit_threshold: float = -1.0


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    """GPT-2 Medium with pseudo self-attention; reference language_model.py."""

    vocab_size: int = C.VOCAB_SIZE
    hidden_dim: int = C.HIDDEN_DIM
    # input dim of the image-feature-space transform (region feature dim)
    image_feature_dim: int = C.REGION_FEATURE_DIM
    num_heads: int = C.NUM_HEADS
    num_layers: int = C.NUM_LAYERS
    max_positions: int = C.MAX_POSITIONS
    bos_token_id: int = C.BOS_TOKEN_ID
    eos_token_id: int = C.EOS_TOKEN_ID
    pad_token_id: int = C.PAD_TOKEN_ID
    embd_dropout: float = 0.1
    attn_dropout: float = 0.1
    resid_dropout: float = 0.1
    layer_norm_eps: float = 1e-5
    # Reference quirk (language_model.py:307): position embeddings are looked
    # up in the *word* embedding table (wte), not wpe. The published
    # checkpoints were trained with this behavior, so it must be preserved
    # for weight-compatible output parity. Set False only for from-scratch runs.
    positions_from_wte: bool = True

    @property
    def head_dim(self) -> int:
        return self.hidden_dim // self.num_heads


@dataclasses.dataclass(frozen=True)
class GenerationConfig:
    """Decode-time settings; reference run_configurations.py:49-52."""

    max_length: int = 300
    num_beams: int = 4
    length_penalty: float = 1.0
    early_stopping: bool = False
    # static KV-cache length buckets for batched decode (TPU-native addition;
    # the reference re-allocates the cache every step)
    length_buckets: Tuple[int, ...] = (64, 128, 304)


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    detector: DetectorConfig = DetectorConfig()
    classifier: ClassifierConfig = ClassifierConfig()
    decoder: DecoderConfig = DecoderConfig()
    generation: GenerationConfig = GenerationConfig()
    region_feature_dim: int = C.REGION_FEATURE_DIM


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Multi-task training; reference run_configurations.py:33-61."""

    pretrain_without_lm: bool = False
    batch_size: int = 16
    grad_accumulation_steps: int = 4   # effective 64
    learning_rate: float = 5e-5
    detector_learning_rate: float = 1e-3  # stage-1 detector-only LR
    evaluate_every_k_batches: int = 2400
    weight_decay: float = 1e-2
    seed: int = 42
    # loss weights: detector 1, selection 5, abnormal 5, LM 2
    loss_weight_detector: float = 1.0
    loss_weight_selection: float = 5.0
    loss_weight_abnormal: float = 5.0
    loss_weight_lm: float = 2.0
    # lr scheduler: torch ReduceLROnPlateau(mode="min", rel threshold) with
    # the reference's values (training_script_object_detector.py:47-50,621)
    lr_patience: int = 5
    lr_factor: float = 0.5
    lr_threshold: float = 1e-3   # relative improvement threshold
    lr_cooldown: int = 5         # validations ignored after each reduction
    # optional early stop: validations without a new best before training
    # halts (the reference documents this intent on its train_model
    # `patience` arg, training_script_object_detector.py:328-330, though its
    # loop never wires it); None disables (matching the reference's code)
    early_stop_patience: Optional[int] = None
    bf16: bool = True
    # language-generation eval is gated until the model has trained long
    # enough to produce non-degenerate sentences (reference
    # evaluate_model.py:549-554 gates at >100k steps)
    lm_eval_min_steps: int = 100_000


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device mesh layout. Inference/training are data-parallel over ICI;
    parameters are replicated (they fit per chip: <1GB bf16). SURVEY.md §2.6."""

    data_axis: str = "data"
    num_devices: Optional[int] = None  # None -> all available


@dataclasses.dataclass(frozen=True)
class RGRGConfig:
    model: ModelConfig = ModelConfig()
    train: TrainConfig = TrainConfig()
    mesh: MeshConfig = MeshConfig()
    # BERTScore soft-dedup threshold (run_configurations.py:57)
    bertscore_similarity_threshold: float = 0.9
